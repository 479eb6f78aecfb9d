"""Sources: landing-zone CSV files, the config registry, JDBC tables."""
