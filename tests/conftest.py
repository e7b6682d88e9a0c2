from __future__ import annotations

import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

from xboard_spark.session import get_spark

_TMP = tempfile.mkdtemp(prefix="xboard-spark-tests-")


@pytest.fixture(scope="session")
def spark():
    # warehouse + derby metastore pinned to a temp dir so saveAsTable tests
    # never write into the repo
    s = get_spark(
        "xboard-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": f"{_TMP}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={_TMP}/derby",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
