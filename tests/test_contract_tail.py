"""Oracle gate for the queries() entries BEYOND the driver's check window.

The driver's correctness gate runs only the first 50 entries of
``__spark_entry__.queries()``; the dict is deliberately ordered
newest/least-verified first, which parks the long-stable tail past position
50.  Parked must not mean exempt: this suite runs every tail entry against
its DuckDB oracle at sf0.001 on each pytest run, so a regression in those
queries (or the helpers they share) fails CI even though the driver never
sees them.
"""

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry  # noqa: E402
from tools.check_contract import compare, duck_connect  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
DRIVER_WINDOW = 50

_all = list(entry.queries())
TAIL = _all[DRIVER_WINDOW:]


def test_tail_is_nonempty_iff_contract_exceeds_window():
    assert len(_all) > DRIVER_WINDOW  # if this shrinks, the suite is vacuous


@pytest.mark.parametrize("name", TAIL)
def test_tail_query_matches_oracle(spark, name):
    got = entry.queries()[name](spark, SF_DIR).toPandas()
    con = duck_connect(SF_DIR)
    want = con.execute(entry.oracle_sql()[name]).df()
    problems = compare(name, got, want)
    assert not problems, problems


def test_changed_queries_sit_inside_driver_window():
    """Mechanical rotation gate (VERDICT r4 #4): any query whose implementing
    module — transitively, through ocr_engine_spark.* references — or oracle
    text changed since the last round-boundary commit must sit in positions
    1..50 of queries(), where the external driver actually checks it."""
    from tools.check_window import check

    violations = check()
    assert not violations, violations
