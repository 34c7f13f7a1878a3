"""Named version refs — Iceberg-style table TAGS: ALTER TABLE CREATE/
DROP TAG, SHOW TAGS, `t$tag('name')` reads and the quoted
`VERSION AS OF '<tag>'` spelling; tags live in the spec so they
survive maintenance and session restarts, and a tag below the
compaction floor refuses at read exactly like a $v anchor."""

import pytest

from fluss_datafusion_spark import EngineSession


@pytest.fixture()
def tagged(spark, tmp_path):
    e = EngineSession(spark=spark, warehouse=str(tmp_path / "wh"))
    e.sql("CREATE TABLE tt (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO tt VALUES (1, 'a')")
    e.sql("ALTER TABLE tt CREATE TAG v1")
    e.sql("INSERT INTO tt VALUES (1, 'b'), (2, 'c')")
    return e


def test_tag_lifecycle_and_reads(tagged):
    e = tagged
    e.sql("ALTER TABLE tt CREATE TAG head-2 AS OF VERSION 2")
    rows = [tuple(r) for r in e.sql("SHOW TAGS tt").collect()]
    assert [(r[0], r[1], r[3]) for r in rows] == [
        ("head-2", 2, True),
        ("v1", 1, True),
    ]
    assert sorted(
        tuple(r) for r in e.sql("SELECT id, v FROM tt$tag('v1')").collect()
    ) == [(1, "a")]
    # Iceberg's quoted spelling
    assert sorted(
        tuple(r)
        for r in e.sql("SELECT id, v FROM tt VERSION AS OF 'v1'").collect()
    ) == [(1, "a")]
    assert sorted(
        tuple(r) for r in e.sql("SELECT id, v FROM tt").collect()
    ) == [(1, "b"), (2, "c")]
    with pytest.raises(ValueError):
        e.sql("ALTER TABLE tt CREATE TAG v1")  # immutable once created
    with pytest.raises(ValueError):
        e.sql("ALTER TABLE tt CREATE TAG fut AS OF VERSION 99")
    e.sql("ALTER TABLE tt DROP TAG v1")
    assert [r.tag_name for r in e.sql("SHOW TAGS tt").collect()] == ["head-2"]
    with pytest.raises(ValueError):
        e.sql("SELECT * FROM tt$tag('v1')")


def test_tags_survive_sessions_and_maintenance(spark, tmp_path):
    wh = str(tmp_path / "wh")
    e = EngineSession(spark=spark, warehouse=wh)
    e.sql("CREATE TABLE mt (id BIGINT NOT NULL, v STRING, PRIMARY KEY (id))")
    e.sql("INSERT INTO mt VALUES (1, 'a')")
    e.sql("ALTER TABLE mt CREATE TAG first")
    e.sql("INSERT INTO mt VALUES (2, 'b')")
    e.sql("OPTIMIZE mt")  # consolidation preserves time travel
    assert sorted(
        tuple(r) for r in e.sql("SELECT id, v FROM mt$tag('first')").collect()
    ) == [(1, "a")]
    # a fresh session re-reads the spec from disk
    e2 = EngineSession(spark=spark, warehouse=wh)
    assert [r.tag_name for r in e2.sql("SHOW TAGS mt").collect()] == ["first"]
    assert sorted(
        tuple(r)
        for r in e2.sql("SELECT id, v FROM mt$tag('first')").collect()
    ) == [(1, "a")]
    # compaction collapses history: the tag dangles and READS refuse,
    # but SHOW TAGS reports it (time_travelable = false)
    e2.catalog.compact("mt")
    rows = [tuple(r) for r in e2.sql("SHOW TAGS mt").collect()]
    assert rows[0][0] == "first" and rows[0][3] is False
    with pytest.raises(Exception):
        e2.sql("SELECT * FROM mt$tag('first')").collect()
