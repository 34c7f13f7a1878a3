"""Driver-contract guards for the query corpus.

The driver's correctness pass canonicalizes results with pandas
``sort_values`` + row hashing, which raises ``TypeError: unhashable
type: 'list'`` on any array/map/struct cell (observed round 3 on the
ANN entries' ``exact_ids array<bigint>`` — two ERR rows that the local
self-check had masked by tuple-izing lists).  These tests pin the
contract: every core-window (first-50) entry must emit scalar-only
columns, and the window must stay exactly 50 entries.
"""

import pytest

from fluss_datafusion_spark import corpus

corpus.load_all()

_NON_SCALAR = ("array", "map", "struct")


def test_core_window_is_exactly_50():
    assert len(corpus.QUERIES) == 50, sorted(corpus.QUERIES)


@pytest.mark.parametrize("name", sorted(corpus.QUERIES))
def test_core_entry_schema_is_scalar_only(spark, name, testdata):
    df = corpus.QUERIES[name](spark, testdata)
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.dataType.typeName() in _NON_SCALAR
    ]
    assert not bad, (
        f"core-window entry {name} emits non-scalar column(s) {bad}; the "
        "driver's canonicalizer cannot hash these — serialize to string "
        "(concat_ws / to_json) on both the Spark and oracle sides"
    )
