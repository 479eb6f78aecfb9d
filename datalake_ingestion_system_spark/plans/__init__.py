"""Pipeline plans: batch ingestion, lake maintenance, JDBC loads."""
