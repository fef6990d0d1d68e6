from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawl_lowres_lang_spark.session import get_spark

TEST_CPUS = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master=f"local[{TEST_CPUS}]")
    yield s
    s.stop()
