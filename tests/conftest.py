from __future__ import annotations

import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_ingestion_system_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_SQL_SHUFFLE_PARTITIONS", "4")
    spark = get_spark("tests")
    yield spark


SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def landing(tmp_path):
    """Reference-shaped landing zone (FIXTURES.md §A1) + mapping config CSV
    (§A2, pipe-separated lists instead of Python literals)."""
    land = tmp_path / "landing"
    land.mkdir()

    def gz(name: str, lines: list[str]) -> None:
        with gzip.open(land / name, "wt") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))

    # 3-col layout valid 2019/01/01..2019/06/10, then 4-col after
    gz("CUSTOMER_MASTER_20190601_023000.CSV.GZ",
       ["1,Alice,EAST", "2,Bob,WEST", "3,千代田,NORTH"])
    gz("CUSTOMER_MASTER_20190615_023000.CSV.GZ",
       ["1,Alice,EAST,a@x.jp", "4,Dan,SOUTH,d@x.jp"])
    gz("SALES_LOG_20190601_040000.CSV.GZ",        # config says 6 cols, has 5
       ["1,2,3,4,5", "6,7,8,9,10"])
    gz("UNKNOWN_FEED_20190601_050000.CSV.GZ", ["a,b"])
    gz("badname.CSV.GZ", ["x,y"])
    gz("CUSTOMER_MASTER_20190699_023000.CSV.GZ", ["9,Z,E"])  # impossible date
    (land / "EMPTY_FEED_20190601_060000.CSV.GZ").write_bytes(b"")

    conf_csv = tmp_path / "mapping.csv"
    conf_csv.write_text(
        "TABLE,HEADLIST,TYPELIST,FEQ,STARTDATE,ENDDATE\n"
        "CUSTOMER_MASTER,CUST_ID|CUST_NAME|REGION_CD,4|1|1,daily,2019/01/01,2019/06/10\n"
        "CUSTOMER_MASTER,CUST_ID|CUST_NAME|REGION_CD|EMAIL,4|1|1|1,daily,2019/06/10,2020/01/01\n"
        "SALES_LOG,C1|C2|C3|C4|C5|C6,,daily,2019/01/01,2020/01/01\n"
        "EMPTY_FEED,A|B,,daily,2019/01/01,2020/01/01\n"
    )
    return {
        "landing": str(land),
        "mapping": str(conf_csv),
        "storing": str(tmp_path / "storing"),
        "state": str(tmp_path / "state"),
        "quarantine": str(tmp_path / "quarantine"),
        "checkpoint": str(tmp_path / "checkpoint"),
        "tmp": tmp_path,
    }
