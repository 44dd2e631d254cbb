"""Train-once/serve-many ANN index (VERDICT r6 item 2): the persisted
artifact answers the same top-k as the composed train+search query, and
the serve path provably runs no training."""

from __future__ import annotations

import pytest

from olr_cdc_oracle_no_dbz_spark.workload import queries
from olr_cdc_oracle_no_dbz_spark.workload import ann_index as ai

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_persists_and_serve_matches_inline(spark, tmp_path):
    idx = str(tmp_path / "index")
    manifest = ai.build_ann_index(spark, SF_DIR, idx)
    assert manifest["n"] == 500 and manifest["k"] >= 8
    assert ai.index_exists(idx)

    served = ai.serve_topk(spark, SF_DIR, idx, 100, 120)
    # the inline train+search gate over the SAME query range must agree
    inline = queries()["ann_topk_ivfpq"](spark, SF_DIR)
    assert _rows(served) == _rows(inline)


def test_serve_runs_no_training(spark, tmp_path, monkeypatch):
    """Poison the trainer: serve_topk over a built index must never call
    _kmeans_train (the whole point of the artifact)."""
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, SF_DIR, idx)

    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries

    def _boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("serve path invoked the trainer")

    monkeypatch.setattr(ext_queries, "_kmeans_train", _boom)
    monkeypatch.setattr(ai, "_kmeans_train", _boom)
    out = ai.serve_topk(spark, SF_DIR, idx, 120, 140)
    assert out.count() > 0


def test_serve_requires_built_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="build_ann_index"):
        ai.serve_topk(spark, SF_DIR, str(tmp_path / "missing"), 0, 5)


def test_stale_index_detected(spark, tmp_path):
    """A regenerated source table invalidates the cached index (the
    gate rebuilds instead of serving dead neighbors)."""
    import os
    import shutil

    src = str(tmp_path / "sf")
    os.makedirs(src)
    shutil.copy(
        os.path.join(SF_DIR, "embeddings.parquet"),
        os.path.join(src, "embeddings.parquet"),
    )
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)
    assert ai.index_fresh(idx, src)
    # "regenerate" the table: same bytes, new mtime
    os.utime(os.path.join(src, "embeddings.parquet"))
    assert not ai.index_fresh(idx, src)


def test_nprobe_serve_matches_compose_and_never_trains(
    spark, tmp_path, monkeypatch
):
    """Multi-probe serve (late r8): nprobe=2 over the persisted index
    must (a) run zero training — the recall dial never rebuilds — and
    (b) agree row-for-row with the composed train+search plan at the
    same nprobe (the determinism argument that lets one oracle check
    both flows)."""
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries

    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, SF_DIR, idx)
    expected = _rows(
        ext_queries._ivfpq_compose(spark, SF_DIR, 160, 180, nprobe=2)
    )

    def _boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("nprobe serve invoked the trainer")

    monkeypatch.setattr(ext_queries, "_kmeans_train", _boom)
    monkeypatch.setattr(ai, "_kmeans_train", _boom)
    served = ai.serve_topk(spark, SF_DIR, idx, 160, 180, nprobe=2)
    assert _rows(served) == expected


def _subset_dir(spark, tmp_path, upto=400):
    """A source dir holding only vectors [0, upto) — the corpus as it
    looked before an ingest batch arrived."""
    import os

    src = str(tmp_path / "sf_subset")
    os.makedirs(src, exist_ok=True)
    (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(f"vec_id < {upto}")
        .write.mode("overwrite")
        .parquet(os.path.join(src, "embeddings.parquet"))
    )
    return src


def test_append_ingests_with_frozen_quantizer(spark, tmp_path, monkeypatch):
    """append_to_index encodes new vectors with the PERSISTED
    quantizer/codebook and runs ZERO training; appended vectors become
    retrievable neighbors."""
    from olr_cdc_oracle_no_dbz_spark.workload import ext_queries

    src = _subset_dir(spark, tmp_path)
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)

    def _boom(*a, **k):  # pragma: no cover - called means failure
        raise AssertionError("append/serve invoked a trainer")

    monkeypatch.setattr(ext_queries, "_kmeans_train", _boom)
    monkeypatch.setattr(ext_queries, "_pq_train", _boom)
    monkeypatch.setattr(ai, "_kmeans_train", _boom)
    monkeypatch.setattr(ai, "_pq_train", _boom)
    manifest = ai.append_to_index(spark, SF_DIR, idx, 400, 500)
    assert manifest["n"] == 500 and manifest["appended"] == [[400, 500]]

    served = ai.serve_topk(spark, SF_DIR, idx, 480, 500)
    rows = served.collect()
    assert len(rows) > 0
    # the appended region's own vectors must be retrievable
    assert any(r["neighbor_id"] >= 400 for r in rows)


def test_append_chunking_invariant_and_retry_safe(spark, tmp_path):
    """Appending [400,450)+[450,500) equals appending [400,500), and a
    RETRIED chunk (the crashed-task replay) changes nothing — the
    overwrite-idempotent batch partition makes duplicate rows (which
    would double ADC sums) unrepresentable."""
    src = _subset_dir(spark, tmp_path)
    idx1 = str(tmp_path / "idx1")
    idx2 = str(tmp_path / "idx2")
    ai.build_ann_index(spark, src, idx1)
    ai.build_ann_index(spark, src, idx2)

    ai.append_to_index(spark, SF_DIR, idx1, 400, 450)
    ai.append_to_index(spark, SF_DIR, idx1, 450, 500)
    ai.append_to_index(spark, SF_DIR, idx2, 400, 500)

    # simulate a crashed second append: the manifest write is atomic,
    # so a crash after the partition writes leaves the manifest at its
    # ENTIRE pre-append state — roll it back and re-run the append
    import json as _json
    import os as _os

    mpath = _os.path.join(idx1, "manifest.json")
    m = _json.load(open(mpath))
    m["appended"] = [r for r in m["appended"] if r != [450, 500]]
    m["max_vec_id"] = 449
    open(mpath, "w").write(_json.dumps(m))
    ai.append_to_index(spark, SF_DIR, idx1, 450, 500)

    a = _rows(ai.serve_topk(spark, SF_DIR, idx1, 100, 140))
    b = _rows(ai.serve_topk(spark, SF_DIR, idx2, 100, 140))
    assert a == b
    n1 = spark.read.parquet(_os.path.join(idx1, "postings")).count()
    assert n1 == 500  # retry did not duplicate


def test_append_refuses_overlap_empty_and_missing(spark, tmp_path):
    src = _subset_dir(spark, tmp_path)
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)
    ai.append_to_index(spark, SF_DIR, idx, 400, 450)
    with pytest.raises(ValueError, match="overlap"):
        ai.append_to_index(spark, SF_DIR, idx, 440, 500)
    with pytest.raises(ValueError, match="append-only"):
        # range the BASE build already covers (subset indexed [0,400))
        ai.append_to_index(spark, SF_DIR, idx, 300, 350)
    with pytest.raises(ValueError, match="empty"):
        ai.append_to_index(spark, SF_DIR, idx, 450, 450)
    with pytest.raises(FileNotFoundError, match="build_ann_index"):
        ai.append_to_index(spark, SF_DIR, str(tmp_path / "nope"), 0, 5)


def test_append_refuses_older_format_index(spark, tmp_path):
    """Appending to a pre-v5 index must refuse, not write a hybrid
    artifact (v4 postings carry no nsq; mixing layouts would NULL the
    base corpus out of every IP-ADC shortlist — r9 code review)."""
    import json as _json
    import os as _os

    src = _subset_dir(spark, tmp_path)
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)
    mpath = _os.path.join(idx, "manifest.json")
    with open(mpath) as fh:
        manifest = _json.load(fh)
    manifest["format_version"] = 4
    with open(mpath, "w") as fh:
        _json.dump(manifest, fh)
    with pytest.raises(ValueError, match="format_version"):
        ai.append_to_index(spark, SF_DIR, idx, 400, 450)


def test_rebuild_clears_stale_batches(spark, tmp_path):
    """Rebuilding into an existing index dir removes previous appends'
    batch partitions — otherwise the new batch=base (covering every id)
    plus the old batch=<lo>-<hi> would double-index the appended ids,
    doubling their ADC sums (review r8 finding)."""
    import os as _os

    src = _subset_dir(spark, tmp_path)
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)
    ai.append_to_index(spark, SF_DIR, idx, 400, 500)
    # corpus regenerated -> full rebuild into the SAME directory
    manifest = ai.build_ann_index(spark, SF_DIR, idx)
    assert manifest["n"] == 500
    assert spark.read.parquet(_os.path.join(idx, "postings")).count() == 500
    dup_codes = (
        spark.read.parquet(_os.path.join(idx, "codes"))
        .groupBy("vec_id", "sub_idx")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_codes == 0
    clean = str(tmp_path / "clean")
    ai.build_ann_index(spark, SF_DIR, clean)
    assert _rows(ai.serve_topk(spark, SF_DIR, idx, 100, 120)) == _rows(
        ai.serve_topk(spark, SF_DIR, clean, 100, 120)
    )


def test_append_refuses_phantom_range_and_gates_fingerprint(spark, tmp_path):
    """A range with no source vectors is refused (recording it would
    permanently block those ids), and a PARTIAL append leaves the OLD
    source fingerprint so freshness keeps refusing until ingest covers
    the whole corpus (review r8 finding: a refreshed fingerprint over
    missing ids would report fresh while silently dropping them from
    every shortlist)."""
    src = _subset_dir(spark, tmp_path)  # holds [0, 400)
    idx = str(tmp_path / "index")
    ai.build_ann_index(spark, src, idx)
    with pytest.raises(ValueError, match="no source vectors"):
        ai.append_to_index(spark, SF_DIR, idx, 600, 700)
    # the corpus grows to 500 but this ingest covers only [400, 450)
    m = ai.append_to_index(spark, SF_DIR, idx, 400, 450)
    assert m["partial_coverage"]["source_n"] == 500
    assert not ai.index_fresh(idx, SF_DIR)
    m = ai.append_to_index(spark, SF_DIR, idx, 450, 500)
    assert "partial_coverage" not in m
    assert ai.index_fresh(idx, SF_DIR)
