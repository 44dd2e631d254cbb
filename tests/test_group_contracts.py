"""Round-9 twin-collapse and group-pair contract pins.

The differential gate proves collapse+expand == naive on the shipped
corpora; these tests pin the same equivalence on an ADVERSARIAL
twin-heavy corpus (every doc replicated K times — the overlap-probe
shape that exposed the r8 near-quadratic enumeration) and the
expansion identities that make the group-pair contract lossless:

- Σ n_member_pairs over the group relation == the member-pair gate's
  row count (dedup_fuzzy_groups vs dedup_fuzzy_levenshtein,
  timeseries_paa_groups vs timeseries_paa_similarity).
- Expanding dedup_fuzzy_groups through its group memberships
  reproduces the pair gate's exact (a_id, b_id, edit_dist) multiset.
- dedup_fuzzy_topk / dedup_minhash_topk match their registered naive
  DuckDB oracles row-for-row on the twin-heavy corpus.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TWIN_K = 4  # replication factor for the adversarial corpus


@pytest.fixture(scope="module")
def q():
    return entry_mod.queries()


@pytest.fixture(scope="module")
def twin_sf(spark, tmp_path_factory):
    """sf0.001 with every document (and every event stream) replicated
    TWIN_K times under fresh ids — 100% exact-twin mass, the shape the
    overlap probe uses and the collapse paths exist for."""
    out = str(tmp_path_factory.mktemp("twin_sf"))
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + k * n_doc).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        for k in range(TWIN_K)
    ]
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    n_usr = ev.agg(F.max("user_id")).first()[0] + 1
    n_evt = ev.agg(F.max("event_id")).first()[0] + 1
    eparts = [
        ev.select(
            (F.col("event_id") + k * n_evt).alias("event_id"),
            "ts",
            (F.col("user_id") + k * n_usr).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(TWIN_K)
    ]
    e = eparts[0]
    for p in eparts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    return out


def _oracle_rows(sf_dir: str, name: str, tables=("documents", "events")):
    sql = entry_mod.oracle_sql()[name]
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p)
                else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _spark_rows(spark, q, sf_dir: str, name: str, cols):
    return [
        tuple(r[c] for c in cols)
        for r in q[name](spark, sf_dir).collect()
    ]


def _assert_matches_oracle(spark, q, sf_dir, name):
    cols, want = _oracle_rows(sf_dir, name)
    got = _spark_rows(spark, q, sf_dir, name, cols)
    canon = lambda rows: sorted(  # noqa: E731
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in rows
    )
    assert canon(got) == canon(want), (
        f"{name}: Spark != naive oracle on twin-heavy corpus "
        f"({len(got)} vs {len(want)} rows)"
    )


def test_fuzzy_topk_matches_naive_on_twin_heavy(spark, q, twin_sf):
    _assert_matches_oracle(spark, q, twin_sf, "dedup_fuzzy_topk")


def test_minhash_topk_matches_naive_on_twin_heavy(spark, q, twin_sf):
    _assert_matches_oracle(spark, q, twin_sf, "dedup_minhash_topk")


def test_fuzzy_groups_matches_oracle_on_twin_heavy(spark, q, twin_sf):
    _assert_matches_oracle(spark, q, twin_sf, "dedup_fuzzy_groups")


def test_fuzzy_groups_expansion_identity(spark, q):
    """Σ n_member_pairs == pair-gate row count, and full expansion
    through group memberships reproduces the pair gate's exact
    (a_id, b_id, edit_dist) multiset — the losslessness receipt."""
    groups = q["dedup_fuzzy_groups"](spark, SF).collect()
    pairs = q["dedup_fuzzy_levenshtein"](spark, SF).collect()
    assert sum(r.n_member_pairs for r in groups) == len(pairs)

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select(
            "doc_id",
            F.split("text", " ").getItem(0).alias("blk"),
            F.substring("text", 1, 80).alias("head"),
        )
        .collect()
    )
    by_key: dict[tuple, list[int]] = {}
    for r in docs:
        by_key.setdefault((r.blk, r.head), []).append(r.doc_id)
    members = {min(ids): sorted(ids) for ids in by_key.values()}
    expanded = []
    for g in groups:
        if g.group_a == g.group_b:
            ms = members[g.group_a]
            expanded += [
                (a, b, g.edit_dist)
                for i, a in enumerate(ms)
                for b in ms[i + 1 :]
            ]
        else:
            expanded += [
                (min(a, b), max(a, b), g.edit_dist)
                for a in members[g.group_a]
                for b in members[g.group_b]
            ]
    want = sorted((r.a_id, r.b_id, r.edit_dist) for r in pairs)
    assert sorted(expanded) == want


def test_paa_groups_expansion_count_identity(spark, q):
    groups = q["timeseries_paa_groups"](spark, SF).collect()
    pairs = q["timeseries_paa_similarity"](spark, SF).count()
    assert sum(r.n_member_pairs for r in groups) == pairs


def test_minhash_topk_bounded_output(spark, q, twin_sf):
    """≤3 rows per doc with contiguous ranks and jaccard in [0, 1] —
    the bounded-write contract itself."""
    rows = q["dedup_minhash_topk"](spark, twin_sf).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rk)
        assert 0.0 <= r.jaccard <= 1.0
    for doc, rks in per_doc.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 3


def test_minhash_groups_matches_oracle_on_twin_heavy(spark, q, twin_sf):
    _assert_matches_oracle(spark, q, twin_sf, "dedup_minhash_groups")


def test_minhash_groups_expansion_count_identity(spark, q):
    groups = q["dedup_minhash_groups"](spark, SF).collect()
    pairs = q["dedup_minhash_lsh"](spark, SF).count()
    assert sum(r.n_member_pairs for r in groups) == pairs
