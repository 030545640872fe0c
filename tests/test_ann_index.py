"""Persistent partition-pruned IVF index (streaming/ann_index.py):
batch-equality, streaming exactly-once, and the physical pruning pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.similarity import ann_ivf
from cumulus_etl_spark.streaming.ann_index import IvfIndex


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_search_equals_batch_ann_ivf(spark, sf_smoke, tmp_path):
    emb = _embeddings(spark, sf_smoke)
    root = str(tmp_path / "ivf")
    idx = IvfIndex(spark, root)
    n = idx.build(emb, n_centroids=8, seed=7)
    assert n == 8
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)
    idx.ingest(landing)

    queries = emb.limit(10)
    got = idx.search(queries, k=5, n_probe=3).collect()
    want = ann_ivf(
        emb, queries, k=5, n_probe=3, centroids=idx.centroids()
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got_m = {key(r): (r["neighbor_id"], round(r["score"], 9)) for r in got}
    want_m = {key(r): (r["neighbor_id"], round(r["score"], 9)) for r in want}
    assert got_m == want_m


def test_ingest_waves_accumulate_and_replay_is_noop(spark, sf_smoke, tmp_path):
    """New data arrives as new files in the SAME landing dir; each
    ingest() call picks up exactly the unprocessed files."""
    emb = _embeddings(spark, sf_smoke)
    landing = str(tmp_path / "landing")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    first.write.mode("append").parquet(landing)

    root = str(tmp_path / "ivf")
    idx = IvfIndex(spark, root)
    idx.build(emb, n_centroids=8)

    idx.ingest(landing)
    n_after_first = spark.read.parquet(idx.lists_dir).count()
    assert n_after_first == first.count()

    # replay with no new files: no-op
    idx.ingest(landing)
    assert spark.read.parquet(idx.lists_dir).count() == n_after_first

    # second wave lands as new files in the same dir
    second.write.mode("append").parquet(landing)
    idx.ingest(landing)
    assert spark.read.parquet(idx.lists_dir).count() == emb.count()

    # search over the fully-ingested index still equals batch IVF
    queries = emb.limit(5)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in idx.search(queries, k=3, n_probe=2).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_ivf(
            emb, queries, k=3, n_probe=2, centroids=idx.centroids()
        ).collect()
    }
    assert got == want


def test_index_stats_reports_balance_and_files(spark, sf_smoke, tmp_path, capsys):
    import json as _json

    from cumulus_etl_spark.cli import main

    emb = _embeddings(spark, sf_smoke)
    landing = str(tmp_path / "landing")
    emb.filter(F.col("vec_id") % 2 == 0).write.mode("append").parquet(landing)

    root = str(tmp_path / "ivf")
    idx = IvfIndex(spark, root)
    idx.build(emb, n_centroids=8)
    idx.ingest(landing)
    s1 = idx.stats()
    assert s1["n_rows"] == emb.filter(F.col("vec_id") % 2 == 0).count()
    assert s1["pq"] is False
    assert s1["imbalance_max_over_mean"] >= 1.0
    # a second wave appends files: rows AND file counts grow
    emb.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(landing)
    idx.ingest(landing)
    s2 = idx.stats()
    assert s2["n_rows"] == emb.count()
    assert s2["n_files"] > s1["n_files"]
    assert sum(s2["list_rows"].values()) == s2["n_rows"]

    assert main(["ann-index", "stats", root]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] == s2["n_rows"]


def test_rebuild_compacts_files_and_preserves_results(spark, sf_smoke, tmp_path):
    """Rebuild = fresh root, copied centroids, one-pass re-ingest: same
    search results, fewer files after many small waves."""
    emb = _embeddings(spark, sf_smoke)
    landing = str(tmp_path / "landing")
    idx = IvfIndex(spark, str(tmp_path / "ivf"))
    idx.build(emb, n_centroids=8)
    # five ingest waves -> five appends' worth of files per touched list
    for w in range(5):
        emb.filter(F.col("vec_id") % 5 == w).write.mode("append").parquet(landing)
        idx.ingest(landing)

    s_old = idx.stats()
    queries = emb.limit(5)
    before = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in idx.search(queries, k=3, n_probe=3).collect()}

    new = idx.rebuild_into(str(tmp_path / "ivf2"), landing)
    s_new = new.stats()
    assert s_new["n_rows"] == s_old["n_rows"]
    assert s_new["n_files"] < s_old["n_files"]  # one wave vs five
    after = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in new.search(queries, k=3, n_probe=3).collect()}
    assert after == before  # same centroids -> identical results

    import pytest

    with pytest.raises(ValueError):  # refuses to clobber an existing root
        idx.rebuild_into(str(tmp_path / "ivf2"), landing)


def test_rebuild_of_pq_index_copies_codebooks_and_preserves_results(
    spark, sf_smoke, tmp_path
):
    emb = _embeddings(spark, sf_smoke).filter(F.col("vec_id") < 80)
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)
    idx = IvfIndex(spark, str(tmp_path / "pq1"))
    idx.build(emb, n_centroids=4, pq_sub=4, pq_k=8)
    idx.ingest(landing)

    new = idx.rebuild_into(str(tmp_path / "pq2"), landing)
    assert new.codebooks() == idx.codebooks()  # copied verbatim, not retrained
    assert set(spark.read.parquet(new.lists_dir).columns) == {
        "neighbor_id", "codes", "list_id"
    }
    queries = emb.limit(4)
    before = {(r["query_id"], r["rank"]): r["neighbor_id"]
              for r in idx.search(queries, k=3, n_probe=4).collect()}
    after = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in new.search(queries, k=3, n_probe=4).collect()}
    assert after == before


def test_pq_index_stores_codes_and_matches_full_adc(spark, sf_smoke, tmp_path):
    """IVFPQ: lists hold codes (no raw vectors); with every list probed,
    ADC search equals the full-corpus pq_adc_topk over the same
    codebooks."""
    from cumulus_etl_spark.operators.quantize import pq_adc_topk

    emb = _embeddings(spark, sf_smoke)
    root = str(tmp_path / "ivfpq")
    idx = IvfIndex(spark, root)
    idx.build(emb, n_centroids=4, pq_sub=4, pq_k=8)
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)
    idx.ingest(landing)

    cols = set(spark.read.parquet(idx.lists_dir).columns)
    assert cols == {"neighbor_id", "codes", "list_id"}  # compressed: no cvec

    queries = emb.limit(5)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["approx_sq_dist"], 9))
        for r in idx.search(queries, k=4, n_probe=4).collect()  # probe ALL lists
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["approx_sq_dist"], 9))
        for r in pq_adc_topk(emb, queries, idx.codebooks(), k=4).collect()
    }
    assert got == want


def test_pq_refine_recovers_exact_ranking(spark, sf_smoke, tmp_path):
    """ADC shortlist + exact re-rank against the lake: with every list
    probed and a shortlist covering the corpus, the refined output IS
    the brute-force exact ranking."""
    from cumulus_etl_spark.operators.similarity import knn_bruteforce

    emb = _embeddings(spark, sf_smoke).filter(F.col("vec_id") < 60)
    root = str(tmp_path / "ivfpq")
    idx = IvfIndex(spark, root)
    idx.build(emb, n_centroids=4, pq_sub=4, pq_k=8)
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)
    idx.ingest(landing)

    queries = emb.limit(4)
    k = 3
    refined = idx.search(
        queries, k=k, n_probe=4, refine_with=emb, refine_factor=100
    )
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in refined.collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_bruteforce(emb, queries, k=k).collect()
    }
    assert got == want
    assert set(refined.columns) == {"query_id", "rank", "neighbor_id", "score"}


def test_ann_index_cli_verb(spark, sf_smoke, tmp_path, capsys):
    import json

    from cumulus_etl_spark.cli import main

    root = str(tmp_path / "ivf")
    landing = str(tmp_path / "landing")
    _embeddings(spark, sf_smoke).write.parquet(landing)

    assert main(["ann-index", "build", root, "--input", landing,
                 "--centroids", "8"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_centroids"] == 8

    assert main(["ann-index", "ingest", root, "--input", landing]) == 0
    ing = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ing["index_rows"] == _embeddings(spark, sf_smoke).count()

    assert main(["ann-index", "search", root, "--query-ids", "0,1",
                 "--k", "3", "--n-probe", "2"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by_q = {}
    for n in res["neighbors"]:
        by_q.setdefault(n["query_id"], []).append(n)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 3 for v in by_q.values())
    assert all(n["neighbor_id"] != n["query_id"] for n in res["neighbors"])


def test_ann_index_cli_pq_roundtrip(spark, sf_smoke, tmp_path, capsys):
    import json

    import pytest

    from cumulus_etl_spark.cli import main

    root = str(tmp_path / "ivfpq")
    landing = str(tmp_path / "landing")
    _embeddings(spark, sf_smoke).write.parquet(landing)

    assert main(["ann-index", "build", root, "--input", landing,
                 "--centroids", "4", "--pq-sub", "4", "--pq-k", "8"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["pq_sub"] == 4
    assert main(["ann-index", "ingest", root, "--input", landing]) == 0
    capsys.readouterr()

    # PQ search without the vector lake fails loudly
    with pytest.raises(SystemExit):
        main(["ann-index", "search", root, "--query-ids", "0"])

    assert main(["ann-index", "search", root, "--query-ids", "0,1",
                 "--k", "3", "--n-probe", "2", "--vectors", landing]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["pq"] is True
    assert {n["query_id"] for n in res["neighbors"]} == {0, 1}
    # refined output is exact-cosine scored (descending per query)
    for q in (0, 1):
        scores = [n["score"] for n in res["neighbors"] if n["query_id"] == q]
        assert scores == sorted(scores, reverse=True)


def test_search_scan_reads_only_probed_partitions(spark, sf_smoke, tmp_path):
    """The pruning pin: the filtered lists scan touches only
    list_id=<probed>/ files, and strictly fewer files than a full scan."""
    emb = _embeddings(spark, sf_smoke)
    root = str(tmp_path / "ivf")
    idx = IvfIndex(spark, root)
    idx.build(emb, n_centroids=8)
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)
    idx.ingest(landing)

    probed = [0, 1]  # literal probe set, as search() constructs it
    pruned = spark.read.parquet(idx.lists_dir).filter(F.col("list_id").isin(probed))

    # the filter lands as a PARTITION filter on the scan (pruned before
    # any file is opened), not a post-scan data filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "list_id" in part_lines[0], plan

    # and the files actually opened at execution are exclusively the
    # probed partitions' files (strictly fewer than a full scan's)
    read = {
        r[0].split("list_id=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert read == {"0", "1"}, read
    all_parts = {
        r[0].split("list_id=")[1].split("/")[0]
        for r in spark.read.parquet(idx.lists_dir)
        .select(F.input_file_name()).distinct().collect()
    }
    assert len(all_parts) > len(read)


def test_ann_index_lifecycle_bench_rig(spark, sf_smoke):
    """The bench-only lifecycle rig (plans/sink_rigs.py) returns one
    accounting row whose numbers reconcile with the corpus: every
    embedding ingested exactly once across the two waves, k results per
    query, and a bounded list imbalance."""
    import duckdb

    from cumulus_etl_spark.plans.catalog import BENCH_RIGS

    row = BENCH_RIGS["ann_index_lifecycle"].build(spark, sf_smoke).collect()[0]
    n_emb = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_smoke}/embeddings.parquet')"
    ).fetchone()[0]
    n_queries = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_smoke}/embeddings.parquet') "
        "WHERE vec_id < 100"
    ).fetchone()[0]
    assert row["n_rows"] == n_emb          # both waves landed, no re-appends
    assert row["n_hits"] == n_queries * 10  # k neighbors for every query
    assert 1 <= row["n_lists"] <= 16
    assert row["imbalance"] >= 1.0


def test_index_root_accepts_hadoop_uri_scheme(spark, sf_smoke, tmp_path):
    """The root is scheme-agnostic: a file:// URI — which plain
    open()/os.makedirs would reject — builds, ingests, searches, and
    rebuilds identically to a bare local path (the sidecar goes through
    the Hadoop FileSystem API, sources/hadoop_io.py)."""
    emb = _embeddings(spark, sf_smoke).filter(F.col("vec_id") < 60)
    landing = str(tmp_path / "landing")
    emb.write.parquet(landing)

    uri_root = f"file://{tmp_path}/uri_ivf"
    plain_root = str(tmp_path / "plain_ivf")
    a = IvfIndex(spark, uri_root)
    b = IvfIndex(spark, plain_root)
    assert a.build(emb, n_centroids=4) == b.build(emb, n_centroids=4)
    assert a.centroids() == b.centroids()  # sidecar round-trips via FS API
    a.ingest(landing)
    b.ingest(landing)
    queries = emb.limit(3)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in a.search(queries, k=3, n_probe=4).collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in b.search(queries, k=3, n_probe=4).collect()}
    assert got == want and got
    # rebuild guards and state-copy work through the URI too
    import pytest

    with pytest.raises(ValueError, match="already exists"):
        a.rebuild_into(uri_root, landing)
    rebuilt = a.rebuild_into(f"file://{tmp_path}/uri_ivf2", landing)
    assert rebuilt.centroids() == a.centroids()
