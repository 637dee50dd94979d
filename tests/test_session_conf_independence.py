"""Every registered query must run under a session WITHOUT the builder's
conveniences (VERDICT r5 task 3 / r6 task 4).

The driver runs queries in ITS OWN SparkSession, not the one
session.get_spark() builds — custom_source_roundtrip ERR'd for two rounds
because spark.sql.python.filterPushdown.enabled was set only at builder
time (session.py). This audit executes each query end-to-end in a session
where every get_spark() convenience conf is pinned to its Spark DEFAULT
(and the timezone to a non-UTC zone), so any query that silently relies
on a builder conf fails HERE instead of as a driver-only ERR.

Values are NOT checked (a non-UTC zone legitimately changes formatted
timestamps); the assertion is that planning + execution succeed. The
value gate is test_oracle_parity / tools/verify_local.py.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

# get_spark() conveniences that a query could silently lean on, pinned to
# adversarial / stock values. newSession() alone is NOT bare: builder
# configs land in the shared SparkConf, which new sessions inherit.
_BARE_CONF = {
    # non-UTC, DST-observing — the strongest timezone adversary
    "spark.sql.session.timeZone": "America/New_York",
    # Spark default: refuses pushFilters-implementing Python sources
    "spark.sql.python.filterPushdown.enabled": "false",
    # Spark default: TIMESTAMP(NANOS) parquet fails the vectorized reader
    "spark.sql.legacy.parquet.nanosAsLong": "false",
    # Spark default in 4.x is true, but pin it off to prove no query
    # NEEDS arrow-batched transfer to run
    "spark.sql.execution.arrow.pyspark.enabled": "false",
}


@pytest.fixture(scope="module")
def bare_spark(spark):
    yield spark.newSession()


@pytest.fixture(autouse=True)
def _repin_bare_conf(bare_spark):
    """Re-pin the adversarial confs before EVERY query: the product code
    under test legitimately flips some of them at read sites
    (table() sets nanosAsLong, read_formatted_text sets filterPushdown) —
    without re-pinning, the first query that does so un-bares the shared
    module session and every later test silently runs under the flipped
    conf, making the audit vacuous for exactly the reliance class it
    exists to catch."""
    for k, v in _BARE_CONF.items():
        bare_spark.conf.set(k, v)


# No exclusions: session.register_data_source works around Spark 4.1's
# session-inconsistent Python data-source registry (batch lookup is
# session-local, streaming lookup goes through the DEFAULT session, and
# the ALREADY_EXISTS pre-check is context-global), so even the Python
# streaming sink (stream_sink_roundtrip) runs from a child session.
def _all_queries():
    from mapreduce_sm_spark.registry import load_all_operators

    return list(load_all_operators().all().items())


@pytest.mark.parametrize(
    "name,q", _all_queries(), ids=lambda x: x if isinstance(x, str) else ""
)
def test_query_runs_in_bare_session(bare_spark, name, q):
    df = q.fn(bare_spark, SF_DIR)
    # limit(1).collect() drives physical planning AND execution — analysis
    # alone would miss worker-side conf checks (the filterPushdown refusal
    # surfaces in the Python data-source worker, not at analysis)
    rows = df.limit(1).collect()
    assert rows is not None
