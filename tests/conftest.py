from __future__ import annotations

import duckdb
import pytest

from search_engine_spark.session import get_spark

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{TESTDATA}/sf0.001/{t}.parquet'"
        )
    return con
