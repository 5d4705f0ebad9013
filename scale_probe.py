#!/usr/bin/env python
"""Scale probe: synthesize a ~10x fixture (sf1-equivalent for the
tables the heavy queries read) and measure wall-time scaling of the
heaviest batch queries, recording evidence that no query hides a
super-linear blowup (SCALE.md carries the committed table).

Fixture synthesis (`.tmp/scale_probe/sf1x/`):

- ``documents``: 10 id-offset replicas of sf0.1; replica k > 0
  renames every whitespace-delimited token with a ``_k`` suffix
  (whitespace runs preserved). The token-rename keeps each replica's
  internal dup/near-dup/gram structure EXACTLY the original's while
  making replicas share no vocabulary -- so pair-generating ops scale
  by corpus size, not by synthetic cross-replica collisions. (Both
  naive replication and word-shuffling fail here: replication makes
  every doc a 10-way near-dup family; shuffling a 31-word vocabulary
  mints random n-grams that collide ACROSS replicas and blow posting
  lists quadratically -- measured, not hypothetical. A larger corpus
  growing its vocabulary is also the realistic shape.)
- ``lineitem``: 10 replicas with l_orderkey/l_partkey/l_suppkey
  offset per replica -- the co-purchase graph becomes 10 disjoint
  copies (linear by construction).
- every other table: copied unchanged (the probed queries read only
  documents/lineitem).

Probe: min-of-2 runs per (query, sf) in one warmed session, factor =
t(sf1x) / t(sf0.1). Queries with staged artifacts
(dedup_index_append's warehouse indexes) measure the steady state --
the second run reads the fingerprint-staged index, exactly the
lifecycle cost the op is declared to have.

Run: python scale_probe.py [--synth-only|--probe-only]
Writes SCALE_PROBE.json.

``--x100``: the escalation round for the three WORST 10x factors
(dedup_edit_distance 9.1, ml_naive_bayes_confusion 8.1, dedup_minhash
5.6 in round 7) -- a 10x factor near 10 is consistent with both
linearity and a creeping quadratic whose crossover sits past the 10x
corpus; only a second decade separates them (linear -> factor ~100,
quadratic -> factor ~10,000). Synthesizes 100 token-renamed document
replicas (the three queries read only ``documents``; every other
table passes through) and appends an ``x100`` section to
SCALE_PROBE.json. Single-run timings (each x100 run is minutes; the
linear-vs-quadratic verdict needs a decade, not ±10%).
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = str(pathlib.Path(__file__).resolve().parent / ".tmp" / "scale_probe" / "sf1x")
REPLICAS = 10

#: the 15 heaviest batch queries of BENCH_r06 (streaming drains are
#: rate/file-bounded, not data-plan-bounded, so they are out of scope)
#: plus the round-7 document-heavy additions (the embeddings table is
#: a passthrough in this fixture, so embedding-only ops would probe a
#: constant input and prove nothing)
QUERIES = [
    "ulm_encode",
    "lm_trigram_backoff",
    "multimodal_text_align",
    "graph_pagerank",
    "dedup_minhash_clusters",
    "ml_naive_bayes_confusion",
    "stats_bootstrap_ci",
    "dedup_minhash",
    "bpe_encode",
    "dedup_index_append",
    "dedup_edit_distance",
    "basket_lift_topk",
    "bpe_train",
    "dedup_simhash",
    "graph_kcore",
    "dedup_cluster_keep_best",
    "dedup_cluster_components_star",
    "graph_common_neighbors",
    # round-9 additions that read the replicated tables (documents /
    # lineitem): the component triage report and the edge scorer
    "graph_component_stats",
    "graph_edge_jaccard",
    # round-9 batch 3-4: the remaining wedge-join consumer and the
    # degree-skew scalar on the same co-purchase substrate
    "graph_preferential_attachment",
    "graph_degree_gini",
    # round-10: events replicate too (user-offset replicas, ts
    # unchanged -- per-user structure identical, day count fixed), so
    # the round-9 event/window families finally get scaling evidence:
    # the md5-relabeled permutation fold, the day-partitioned
    # sweep-line, the user-keyed candle indicator, and the islands
    # kernel whose r9 bench drift is under diagnosis
    "stats_permutation_test",
    "events_concurrency_peak",
    "window_macd",
    "interval_merge",
    # round-10 additions on the replicated tables
    "text_common_trigram_coverage",
    "lm_perplexity_bucket",
    "graph_rich_club",
    "window_vwap_bands",
    "stats_ansari_bradley",
    # round-12 additions: the edge-grain wedge join on the co-purchase
    # graph, the new value-alphabet rank test, and the Sobel kernel
    # (documents replicate; dedup_simhash re-probes below because its
    # hash family changed to md5-derived chunks this round)
    "graph_edge_triangle_support",
    "stats_brunner_munzel",
    "multimodal_image_edge_density",
]

PASSTHROUGH = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "embeddings",
)


#: x100 escalation targets: the three worst 10x factors of round 7,
#: plus (round 9) the two LSH+connected-components compositions whose
#: scale risk is ROUND COUNT, not volume -- the 10x probe showed ~5x
#: factors, but CC's iteration count grows with component diameter,
#: which only a second decade of data can stress.
X100_OUT = str(
    pathlib.Path(__file__).resolve().parent / ".tmp" / "scale_probe" / "sf10x"
)
X100_REPLICAS = 100
X100_QUERIES = [
    "dedup_edit_distance",
    "ml_naive_bayes_confusion",
    "dedup_minhash",
    "dedup_minhash_clusters",
    "dedup_cluster_keep_best",
    # round-10: the two new document-heavy additions whose 10x
    # factors (8.55 / 2.99) warrant a second decade -- the trigram
    # top-k broadcast and the two-branch unigram scan
    "text_common_trigram_coverage",
    "lm_perplexity_bucket",
    # round-11 (VERDICT r10 #6): the two iterative-join families whose
    # scale risk is round count x per-round shuffle (10x factors
    # 2.58 / 2.52), and the streaming ingest lifecycle (unstaged per
    # run -- see X100_UNSTAGE)
    "graph_pagerank",
    "graph_kcore",
    "stream_index_ingest",
    # round-12 (VERDICT r11 #5): the ANN ladder -- the family whose
    # recall/latency trade CHANGES with corpus density, so the x100
    # run also re-measures recall@5 vs brute force (X100_RECALL)
    "similarity_ann_lsh",
    "similarity_ann_pq",
    "similarity_ann_ivfpq",
    "similarity_incremental_lsh",
    # round-12: the md5-chunk SimHash at 100x document density -- the
    # banding question (does bucket_cap hold the within-cell
    # quadratic?) only a second decade of corpus stresses
    "dedup_simhash",
]

#: ANN entries also record recall@5 vs an exact numpy-GEMM brute
#: force on the SAME fixture (corpus restricted to vec_id >= 10 for
#: the incremental op, whose registry plan probes new-vs-corpus).
X100_RECALL = {
    "similarity_ann_lsh": None,
    "similarity_ann_pq": None,
    "similarity_ann_ivfpq": None,
    "similarity_incremental_lsh": 10,
}


def _unstage_index_ingest(spark, sf_dir: str) -> None:
    """Force stream_index_ingest to replay its FULL lifecycle: the op
    is _DONE_FP-staged (a rerun on the same fixture reads the
    persisted verdict parquet in ~0.1 s), so a min-of-N timing would
    measure the staged read, not the microbatch ingest the probe is
    after. Deleting the stage root resets the marker; the op itself
    drops its warehouse index tables on replay."""
    sf_name = pathlib.Path(sf_dir).name
    shutil.rmtree(
        pathlib.Path(__file__).resolve().parent
        / ".tmp" / "stream" / f"{sf_name}_index_ingest",
        ignore_errors=True,
    )


#: Lifecycle-staged queries: run the unstage hook before EVERY timed
#: run (base and x100) so each run pays the end-to-end lifecycle.
X100_UNSTAGE = {
    "stream_index_ingest": _unstage_index_ingest,
}


def synthesize_x100() -> None:
    """100 document replicas under per-replica SUBSTITUTION CIPHERS;
    everything else passes through (the x100 queries read only
    documents).

    Cipher, not the 10x probe's ``_k`` token-suffix rename: suffixing
    leaves every mid-token substring (``"quick"`` inside
    ``"quick_17"``) shared across the 90 equal-length replicas, so
    dedup_edit_distance's SEGMENT cells (substrings of the 24-char
    prefix) collide cross-replica and the probe join goes quadratic
    in replica count -- a synthesis artifact, measured at factor 333
    before this fix (whole-token-keyed ops like naive-bayes and
    MinHash were immune: their keys always contain the suffix). A
    bijective per-replica char map preserves within-replica dup/gram
    structure AND lengths exactly while sharing no multi-char
    substring across replicas -- the shape of a real corpus whose
    vocabulary grows with size."""
    import random
    import string

    import duckdb
    import pandas as pd

    os.makedirs(X100_OUT, exist_ok=True)
    for t in PASSTHROUGH + ("events",):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{X100_OUT}/{t}.parquet")
    con = duckdb.connect()
    # lineitem: key-offset replicas exactly like the 10x synthesis
    # (round-11: graph_kcore joined the x100 list and reads the
    # co-purchase graph off lineitem -- a passthrough copy would
    # probe a constant input and prove nothing). Offsets keep the
    # replicas' order/part key spaces disjoint, so co-purchase pairs
    # scale linearly by construction, as a real 100x corpus's would.
    lcols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{BASE}/lineitem.parquet')"
        ).fetchall()
    ]
    loffs = {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
             "l_suppkey": 100_000}
    lsel = ", ".join(
        f"{c} + k * {loffs[c]} AS {c}" if c in loffs else c for c in lcols
    )
    con.execute(
        f"""COPY (SELECT {lsel}
                  FROM read_parquet('{BASE}/lineitem.parquet'),
                       range(0, {X100_REPLICAS}) t(k))
            TO '{X100_OUT}/lineitem.parquet' (FORMAT parquet)"""
    )
    df = con.execute(
        f"SELECT * FROM read_parquet('{BASE}/documents.parquet')"
    ).df()
    alphabet = string.ascii_lowercase + string.ascii_uppercase + string.digits
    parts = []
    for k in range(X100_REPLICAS):
        d = df.copy()
        d["doc_id"] = d["doc_id"] + k * 1_000_000
        if k:
            rnd = random.Random(k)
            lo = list(string.ascii_lowercase)
            up = list(string.ascii_uppercase)
            dg = list(string.digits)
            for cls in (lo, up, dg):
                rnd.shuffle(cls)
            table = str.maketrans(alphabet, "".join(lo + up + dg))
            d["text"] = d["text"].str.translate(table)
        parts.append(d)
    con.register("docs100", pd.concat(parts, ignore_index=True))
    con.execute(
        f"COPY docs100 TO '{X100_OUT}/documents.parquet' (FORMAT parquet)"
    )
    # embeddings: 100 replicas under per-replica SIGNED DIMENSION
    # PERMUTATIONS (round-12, VERDICT r11 #5) -- each replica's map is
    # an orthogonal transform, so within-replica norms and cosines
    # are preserved EXACTLY (the replica keeps the base corpus's
    # neighbor structure) while cross-replica cosines decorrelate --
    # the shape of a corpus whose density grows 100x. Plain
    # replication would plant 99 exact duplicates of every neighbor
    # (recall would read artificially easy); random noise would
    # destroy the within-replica structure the ANN ladder indexes.
    import numpy as np

    edf = con.execute(
        f"SELECT * FROM read_parquet('{BASE}/embeddings.parquet')"
    ).df()
    base_m = np.array(list(edf["embedding"]), dtype=np.float32)
    dim = base_m.shape[1]
    eparts = []
    for k in range(X100_REPLICAS):
        d = edf.copy()
        d["vec_id"] = d["vec_id"] + k * 1_000_000
        if k:
            rnd = np.random.RandomState(1000 + k)
            perm = rnd.permutation(dim)
            signs = rnd.choice([-1.0, 1.0], size=dim).astype(np.float32)
            d["embedding"] = list(base_m[:, perm] * signs)
        eparts.append(d)
    con.register("emb100", pd.concat(eparts, ignore_index=True))
    con.execute(
        f"""COPY (SELECT * REPLACE (CAST(embedding AS FLOAT[]) AS embedding)
                  FROM emb100)
            TO '{X100_OUT}/embeddings.parquet' (FORMAT parquet)"""
    )
    print(f"# synthesized {X100_OUT}", file=sys.stderr)


def _exact_topk_pairs(spark, sf_dir: str, corpus_min=None, k: int = 5):
    """Exact (qid, nid) top-k pairs by numpy-GEMM brute force over
    the fixture -- the recall referee for the ANN x100 entries.
    ``corpus_min`` restricts candidates to vec_id >= corpus_min (the
    incremental op's new-vs-corpus split); default scores the whole
    corpus with self excluded, matching the batch ANN ops."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from java_mapreduce_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q_rows = (
        emb.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    )  # 10 query vectors only
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qm_n))
    cand = emb if corpus_min is None else emb.filter(
        F.col("vec_id") >= corpus_min
    )

    def score(batches):
        b_qids, b_qm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            cm_n = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm_n @ b_qm.T
            nids = pdf["vec_id"].to_numpy(dtype=np.int64)
            # local top-k per batch: only k rows per query leave
            out = []
            for qi, qid in enumerate(b_qids):
                s = sims[:, qi]
                top = np.argsort(-s, kind="stable")[: k + 1]
                for j in top:
                    out.append((qid, int(nids[j]), float(s[j])))
            yield pd.DataFrame(out, columns=["qid", "nid", "cos_sim"])

    scored = cand.select("vec_id", "embedding").mapInPandas(
        score, "qid long, nid long, cos_sim double"
    ).filter(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("nid")
    )
    rows = (
        scored.select(
            "qid", "nid", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= k)
        .collect()
    )
    return {(r["qid"], r["nid"]) for r in rows}


def probe_x100() -> None:
    from java_mapreduce_framework_spark.plans import registry
    from java_mapreduce_framework_spark.session import get_spark

    spark = get_spark("jmrf-scale-probe-x100")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.registry()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(100).mapInPandas(_ident, "id long").count()

    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    results: dict[str, dict] = {}
    exact_cache: dict = {}
    for name in X100_QUERIES:
        if only and name not in only:
            continue
        ts = {}
        unstage = X100_UNSTAGE.get(name)
        for sd, tag, runs in ((BASE, "base", 2), (X100_OUT, "x100", 1)):
            if unstage is not None:
                runs = 1  # each run pays the full lifecycle; min-of-N
                # would just multiply minutes of probe wall-clock
            best = float("inf")
            for _ in range(runs):
                if unstage is not None:
                    unstage(spark, sd)
                t0 = time.perf_counter()
                specs[name].fn(spark, sd).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            ts[tag] = round(best, 3)
        results[name] = {
            **ts,
            "factor": round(ts["x100"] / ts["base"], 1),
        }
        if name in X100_RECALL:
            # recall@5 at x100 density vs exact brute force (the
            # point of probing ANN at all -- VERDICT r11 #5)
            cmin = X100_RECALL[name]
            if cmin not in exact_cache:
                exact_cache[cmin] = _exact_topk_pairs(
                    spark, X100_OUT, corpus_min=cmin
                )
            exact = exact_cache[cmin]
            got = {
                (r["qid"], r["nid"])
                for r in specs[name].fn(spark, X100_OUT).collect()
            }
            results[name]["recall_at_5_x100"] = round(
                len(exact & got) / len(exact), 3
            )
        print(f"# x100 {name}: {results[name]}", file=sys.stderr, flush=True)
    path = pathlib.Path(__file__).resolve().parent / "SCALE_PROBE.json"
    doc = json.loads(path.read_text()) if path.exists() else {}
    # merge: subset runs extend the recorded x100 table, never shrink it
    prior = doc.get("x100", {}).get("queries", {})
    doc["x100"] = {
        "base": BASE,
        "fixture": X100_OUT,
        "replicas": X100_REPLICAS,
        "queries": {**prior, **results},
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc["x100"]))


def synthesize() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in PASSTHROUGH:
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")

    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{BASE}/lineitem.parquet')"
        ).fetchall()
    ]
    offs = {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000}
    sel = ", ".join(
        f"{c} + k * {offs[c]} AS {c}" if c in offs else c for c in cols
    )
    con.execute(
        f"""COPY (SELECT {sel}
                  FROM read_parquet('{BASE}/lineitem.parquet'),
                       range(0, {REPLICAS}) t(k))
            TO '{OUT}/lineitem.parquet' (FORMAT parquet)"""
    )

    # events: user-offset replicas with ts/type/value untouched --
    # every per-user series (sessions, candles, islands) is an exact
    # copy of an original user's, so user-keyed ops are linear by
    # construction and day-keyed reductions see the same day universe
    # at 10x the rows (the realistic more-users-same-window shape)
    ecols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{BASE}/events.parquet')"
        ).fetchall()
    ]
    eoffs = {"event_id": 100_000_000, "user_id": 1_000_000}
    esel = ", ".join(
        f"{c} + k * {eoffs[c]} AS {c}" if c in eoffs else c for c in ecols
    )
    con.execute(
        f"""COPY (SELECT {esel}
                  FROM read_parquet('{BASE}/events.parquet'),
                       range(0, {REPLICAS}) t(k))
            TO '{OUT}/events.parquet' (FORMAT parquet)"""
    )

    import re

    df = con.execute(
        f"SELECT * FROM read_parquet('{BASE}/documents.parquet')"
    ).df()
    parts = []
    for k in range(REPLICAS):
        d = df.copy()
        d["doc_id"] = d["doc_id"] + k * 1_000_000
        if k:
            def rename(text: str, k: int = k) -> str:
                return "".join(
                    p if not p or p.isspace() else f"{p}_{k}"
                    for p in re.split(r"(\s+)", text)
                )

            d["text"] = d["text"].map(rename)
        parts.append(d)
    import pandas as pd

    con.register("docs10", pd.concat(parts, ignore_index=True))
    con.execute(f"COPY docs10 TO '{OUT}/documents.parquet' (FORMAT parquet)")
    print(f"# synthesized {OUT}", file=sys.stderr)


def probe() -> None:
    from java_mapreduce_framework_spark.plans import registry
    from java_mapreduce_framework_spark.session import get_spark

    spark = get_spark("jmrf-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.registry()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    spark.range(100).mapInPandas(_ident, "id long").count()

    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    results: dict[str, dict] = {}
    for name in QUERIES:
        if only and name not in only:
            continue
        ts = {}
        for sd, tag in ((BASE, "base"), (OUT, "x10")):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                specs[name].fn(spark, sd).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            ts[tag] = round(best, 3)
        results[name] = {
            **ts,
            "factor": round(ts["x10"] / ts["base"], 2),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)
    path = pathlib.Path(__file__).resolve().parent / "SCALE_PROBE.json"
    # preserve the x100 section (and any prior 10x rows a subset run
    # didn't re-measure) -- same merge discipline as probe_x100
    prior = json.loads(path.read_text()) if path.exists() else {}
    out = {
        "base": BASE,
        "x10": OUT,
        "replicas": REPLICAS,
        "queries": {**prior.get("queries", {}), **results},
    }
    if "x100" in prior:
        out["x100"] = prior["x100"]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("base", "x10", "replicas", "queries")}))


if __name__ == "__main__":
    if "--x100" in sys.argv:
        if "--probe-only" not in sys.argv:
            synthesize_x100()
        if "--synth-only" not in sys.argv:
            probe_x100()
    else:
        if "--probe-only" not in sys.argv:
            synthesize()
        if "--synth-only" not in sys.argv:
            probe()
