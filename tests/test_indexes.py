"""SI / bloom index tests — mirrors the reference's secondary-index
and bloom suites (SURVEY.md §5: index/, blockprune/,
TestPruneUsingSegmentMinMax)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table


@pytest.fixture()
def table(spark, tmp_path):
    # city column is NOT sorted → min/max pruning is useless for it,
    # exactly the case secondary indexes exist for
    t = Table.create(spark, str(tmp_path / "t"),
                     "id bigint, city string, age int",
                     {"sort_columns": ["id"], "sort_scope": "global_sort"})
    for lo in range(0, 500, 100):
        t.insert(spark.range(lo, lo + 100).select(
            "id",
            F.concat(F.lit("city_"), (F.col("id") % 97)).alias("city"),
            (F.col("id") % 60).cast("int").alias("age")))
    return t


def _nfiles(t, preds, **kw):
    return sum(len(v) for v in t.scan_files(preds, **kw).values())


def test_secondary_index_prunes(spark, table):
    no_index = _nfiles(table, [("city", "=", "city_5")])
    table.indexes.create_secondary_index("si_city", ["city"])
    with_index = _nfiles(table, [("city", "=", "city_5")])
    assert with_index < no_index
    df = table.read([("city", "=", "city_5")])
    assert df.count() == 6                        # 5,102,199,296,393,490 → %97
    assert df.filter("city != 'city_5'").count() == 0


def test_si_stale_segment_soundness(spark, table):
    table.indexes.create_secondary_index("si_city", ["city"])
    # new load AFTER index build — must still be visible in queries
    table.insert(spark.range(1000, 1010).select(
        "id", F.lit("city_5").alias("city"), F.lit(1).alias("age")))
    df = table.read([("city", "=", "city_5")])
    assert df.count() == 6 + 10
    # refresh re-covers everything and prunes tighter again
    before = _nfiles(table, [("city", "=", "city_999")])
    table.indexes.refresh("si_city")
    after = _nfiles(table, [("city", "=", "city_999")])
    assert after <= before
    assert table.read([("city", "=", "city_999")]).count() == 0


def test_ni_escape_hatch(spark, table):
    table.indexes.create_secondary_index("si_city", ["city"])
    with_idx = _nfiles(table, [("city", "=", "city_5")])
    without = _nfiles(table, [("city", "=", "city_5")], use_indexes=False)
    assert without >= with_idx                    # NI() disables SI use


def test_bloom_index_prunes(spark, table):
    table.indexes.create_bloom_index("bf_age", ["age"])
    # age repeats every 60 ids → present in all files; equality on an
    # absent value must prune everything
    none = _nfiles(table, [("age", "=", 1234)])
    assert none == 0
    assert table.read([("age", "=", 1234)]).count() == 0
    some = table.read([("age", "=", 30)])
    assert some.count() == 8                      # 30,90,...,450 < 500


def test_in_predicate_uses_index(spark, table):
    table.indexes.create_secondary_index("si_city", ["city"])
    n = _nfiles(table, [("city", "in", ["city_5", "city_6"])])
    assert n < _nfiles(table, None)
    assert table.read([("city", "in", ["city_5", "city_6"])]).count() == 12


@pytest.fixture()
def docs_table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "docs"),
                     "doc_id bigint, body string", {})
    rows1 = [(i, f"alpha common w{i}") for i in range(50)]
    rows2 = [(i, f"bravo common w{i}") for i in range(50, 100)]
    t.insert(spark.createDataFrame(rows1, "doc_id bigint, body string"))
    t.insert(spark.createDataFrame(rows2, "doc_id bigint, body string"))
    return t


def test_fts_index_prunes_and_matches(spark, docs_table):
    t = docs_table
    total = _nfiles(t, None)
    t.indexes.create_fts_index("ft_body", ["body"])
    # 'alpha' lives only in segment 0 → its files prune away the rest
    n = _nfiles(t, [("body", "text_match", ["alpha"])])
    assert 0 < n < total
    # prefix wildcard: w5* matches w5, w50..w59 (both segments' files)
    pref_files = t.scan_files([("body", "text_match", ["w5*"])])
    pref = sum(len(v) for v in pref_files.values())
    assert 0 < pref <= total
    got = t.read([("body", "text_match", ["w5*"])], apply_predicates=False)
    assert got.filter("body rlike '(^| )w5[0-9]?($| )'").count() == 11
    # conjunction intersects postings
    both = _nfiles(t, [("body", "text_match", ["alpha", "w7"])])
    assert 0 < both <= n
    # absent term prunes everything
    assert _nfiles(t, [("body", "text_match", ["zulu"])]) == 0
    # exact rows (pruning is a skip, not the filter)
    got = t.read([("body", "text_match", ["alpha"])],
                 apply_predicates=False)
    assert got.filter("body like 'alpha %'").count() == 50


def test_fts_or_and_phrase_pruning(spark, docs_table):
    t = docs_table
    t.indexes.create_fts_index("ft_body", ["body"])
    total = _nfiles(t, None)
    n_alpha = _nfiles(t, [("body", "text_match", ["alpha"])])
    # any-mode: union of per-term file sets
    n_or = _nfiles(t, [("body", "text_match_any", ["alpha", "bravo"])])
    assert n_or == total                       # both segments covered
    n_half = _nfiles(t, [("body", "text_match_any", ["alpha", "zulu"])])
    assert n_half == n_alpha                   # absent branch adds nothing
    # a non-prunable wildcard branch makes the union unprunable (sound)
    n_wild = _nfiles(t, [("body", "text_match_any", ["alpha", "w?"])])
    assert n_wild == total
    # phrase term = intersection of its tokens' postings
    n_phrase = _nfiles(t, [("body", "text_match", ["alpha common"])])
    assert n_phrase == n_alpha
    assert _nfiles(t, [("body", "text_match", ["alpha bravo"])]) == 0


def test_fts_fuzzy_dictionary_expansion(spark, docs_table):
    t = docs_table
    t.indexes.create_fts_index("ft_body", ["body"])
    total = _nfiles(t, None)
    n_alpha = _nfiles(t, [("body", "text_match", ["alpha"])])
    # 'alpba'~1 expands to 'alpha' via the token dictionary → same
    # file set as the exact term
    assert _nfiles(t, [("body", "text_match", ["alpba~1"])]) == n_alpha
    # distance 2 reaches both 'alpha' and 'bravo'? no — but 'commot'~1
    # reaches 'common' which spans all segments
    assert _nfiles(t, [("body", "text_match", ["commot~1"])]) == total
    # nothing within one edit of a far token → all files pruned
    assert _nfiles(t, [("body", "text_match", ["zzzzzz~1"])]) == 0
    # fuzzy AND exact intersect
    n_both = _nfiles(t, [("body", "text_match", ["alpba~1", "w7"])])
    assert 0 < n_both <= n_alpha


def test_fts_stale_segment_soundness(spark, docs_table):
    t = docs_table
    t.indexes.create_fts_index("ft_body", ["body"])
    t.insert(spark.createDataFrame([(999, "alpha late")],
                                   "doc_id bigint, body string"))
    # post-index segment must never be pruned away
    files = t.scan_files([("body", "text_match", ["charlie"])])
    n_new = sum(len(v) for v in files.values())
    assert n_new >= 1                      # the late segment survives
    rebuilt = t.indexes.repair()
    assert rebuilt == ["ft_body"]
    assert t.indexes.repair() == []        # now fresh → no-op


def test_show_and_drop(spark, table):
    table.indexes.create_secondary_index("si_city", ["city"])
    table.indexes.create_bloom_index("bf_age", ["age"])
    names = {m["name"] for m in table.indexes.show()}
    assert names == {"si_city", "bf_age"}
    table.indexes.drop("si_city")
    assert {m["name"] for m in table.indexes.show()} == {"bf_age"}
    # duplicate create rejected
    with pytest.raises(FileExistsError):
        table.indexes.create_bloom_index("bf_age", ["age"])


def test_bloom_sidecar_is_parquet_not_meta_json(spark, table):
    import json, os
    table.indexes.create_bloom_index("bl2", ["city"])
    meta = json.load(open(os.path.join(
        table.table_dir, "_meta", "index_bl2.json")))
    assert "blooms" not in meta            # no bitsets in driver meta
    idx_dir = os.path.join(table.table_dir, "_meta", "indexes", "bl2")
    assert any(f.endswith(".parquet") for f in os.listdir(idx_dir))
    # and the sidecar actually prunes
    assert table.read([("city", "=", "city_5")]).count() == 6


def test_cost_based_pick_skips_bloom_when_si_answers(spark, table):
    im = table.indexes
    im.create_secondary_index("si_city2", ["city"])
    im.create_bloom_index("bl_city2", ["city"])
    allowed = im.candidate_files([("city", "=", "city_5")])
    assert allowed is not None
    # the exact SI ran; the (more expensive) bloom was short-circuited
    assert im.last_consulted[0] == "si_city2"
    assert "bl_city2" not in im.last_consulted
