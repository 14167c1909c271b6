"""CDC merge semantics that the driver's value-hash oracle can't isolate:
presence-based update wins (NULL in the new image overwrites), tombstones
drop, inserts append.
"""

from __future__ import annotations

from breweries_data_engineering_case_spark.operators.merge import merge_upsert


def test_merge_upsert_null_in_update_image_overwrites(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [
            (2, None, 99.0, False),  # update with legit NULL payload
            (3, "c", 30.0, True),  # tombstone
            (4, "d", 40.0, False),  # insert
        ],
        "k long, name string, v double, _deleted boolean",
    )
    out = {r.k: r for r in merge_upsert(target, updates, key="k").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].name == "a" and out[1].v == 10.0  # untouched
    assert out[2].name is None and out[2].v == 99.0  # NULL overwrote 'b'
    assert out[4].name == "d"  # insert


def test_merge_upsert_idempotent(spark):
    """Applying the same change set twice yields the same snapshot."""
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    changes = spark.createDataFrame(
        [(2, 22.0, False), (3, 33.0, False)], "k long, v double, _deleted boolean"
    )
    once = merge_upsert(target, changes, key="k")
    twice = merge_upsert(once, changes, key="k")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
