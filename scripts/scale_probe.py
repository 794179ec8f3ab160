"""Empirical scaling probe for the quadratic-risk operator families.

Generates seeded synthetic embeddings/documents at 1x and 10x with
CONSTANT distributional density (cluster occupancy, dup rate, doc
length do not change with n — only n does), times the at-risk
operators warm at both sizes, and prints observed scaling exponents
alpha = log(t_10x / t_1x) / log(10).  alpha ~ 1 is linear, ~ 2 is
quadratic.  Results are recorded in SCALE.md ("Measured scaling
exponents"); re-run with:

    python scripts/scale_probe.py

Data lands under .scaleprobe/ (gitignored, inside the repo tree) and
is regenerated on each run.  The probe measures:

* semantic pair stage, FIXED k=8, uncapped      -> the hazard (~n^2)
* semantic pair stage, FIXED k=8, default cap   -> bounded (guard works)
* semantic pair stage, k = codebook_k(n), cap   -> production (~n)
* sim_ann_ivf_kmeans (registered query)         -> ~n (fixed queries)
* minhash_match_new 80/20 production split      -> ~n (shard-driven)
* dedup_incremental_minhash (registered query)  -> ~n (shard-driven)

The pair stages are timed through the Arrow GEMM twin
(`semantic_dedup_pairs_arrow`) so the uncapped 10x point finishes in
seconds instead of minutes — the twin is equivalence-tested against
the expression path, and Sigma|cluster|^2 drives both identically.

Two exponents are reported per operator: alpha_t on wall time and
alpha_w on the result row count (the work driver).  At probe sizes
fixed Spark job overhead (~0.3-0.5s) dominates wall time, so alpha_t
understates asymptotic behavior; alpha_w is exact and noise-free —
the pair stages get an extra 30x point so the time trend is visible
past the overhead floor.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PROBE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaleprobe")
EMB_N1, DOC_N1, SCALE = 2_000, 5_000, 10
DIM = 64
PER_CLUSTER = 250  # probe-size analog of the k ~ n/1000 rule


def _gen(out_dir: str, n_emb: int, n_doc: int, seed: int = 7) -> None:
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # embeddings: gaussian mixture, centers scale with n (constant
    # occupancy), 2% near-duplicates of earlier vectors
    g = max(4, n_emb // PER_CLUSTER)
    centers = rng.standard_normal((g, DIM)) * 2.0
    v = centers[rng.integers(0, g, n_emb)] + rng.standard_normal((n_emb, DIM)) * 0.5
    dup_idx = rng.choice(n_emb - 1, size=n_emb // 50, replace=False) + 1
    v[dup_idx] = v[dup_idx - rng.integers(1, dup_idx + 1)] + rng.standard_normal(
        (len(dup_idx), DIM)
    ) * 0.01
    pd.DataFrame(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in v],
            "label": rng.integers(0, 4, n_emb).astype(np.int32),
        }
    ).to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)
    # documents: 80-token docs over a 2000-word vocab, 5% near-dups
    vocab = np.array([f"w{i:04d}" for i in range(2000)])
    toks = vocab[rng.integers(0, 2000, (n_doc, 80))]
    texts = [" ".join(row) for row in toks]
    for i in rng.choice(n_doc - 1, size=n_doc // 20, replace=False) + 1:
        base = texts[rng.integers(0, i)].split()
        for p in rng.integers(0, 80, 3):
            base[p] = vocab[rng.integers(0, 2000)]
        texts[i] = " ".join(base)
    pd.DataFrame(
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": [["en", "de", "fr"][i % 3] for i in range(n_doc)],
            "source": [["web", "book", "code"][i % 3] for i in range(n_doc)],
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)


def timed(fn, reps: int = 1, work: int | None = None) -> tuple[float, int]:
    """Warm once, then min over reps (downward noise only for fixed
    work on a shared host; min tracks the achievable time). Returns
    (best_secs, work) — ``work`` defaults to fn()'s row count, but the
    pair stages pass Sigma|cluster|^2 (the candidate-pair space their
    GEMM actually evaluates): output rows stay ~linear even when the
    internal work is quadratic, so rows alone would hide the hazard."""
    rows = fn()  # warm
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best, int(rows if work is None else work)


def main() -> None:
    from pyspark.sql import functions as F

    from tripl_spark.operators.clustering import (
        _assign_round,
        codebook_k,
        semantic_dedup_pairs_arrow,
    )
    from tripl_spark.operators.dedup import minhash_match_new
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded
    from tripl_spark.session import get_spark, load_table

    _ensure_loaded()
    spark = get_spark("scale_probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.isdir(PROBE_DIR):
        shutil.rmtree(PROBE_DIR)
    PAIR_MULTS = (1, SCALE, 30)  # extra 30x point for the pair stages
    dirs = {}
    for mult in sorted(set((1, SCALE) + PAIR_MULTS)):
        d = os.path.join(PROBE_DIR, f"x{mult}")
        _gen(d, EMB_N1 * mult, DOC_N1 * mult if mult in (1, SCALE) else 100, seed=7)
        dirs[mult] = d

    results: dict[str, dict[int, tuple[float, int]]] = {}

    def record(name: str, mult: int, tr: tuple[float, int], note: str = "") -> None:
        results.setdefault(name, {})[mult] = tr
        print(f"  {name:44s} x{mult:<3d} {tr[0]:8.2f}s {tr[1]:>10d} rows  {note}",
              flush=True)

    for mult, d in dirs.items():
        n = EMB_N1 * mult
        emb = load_table(spark, d, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        # seeded centroids (first k vectors), k fixed vs k by the rule
        def seeds(k: int):
            return emb.filter(F.col("vec_id") < k).select(
                F.col("vec_id").alias("cid"), F.col("v").alias("cv")
            )

        a8 = _assign_round(emb, seeds(8)).select("vec_id", "v", "cid") \
            .localCheckpoint(eager=True)
        krule = codebook_k(n, per_cluster=PER_CLUSTER)
        ar = _assign_round(emb, seeds(krule)).select("vec_id", "v", "cid") \
            .localCheckpoint(eager=True)

        from tripl_spark.operators.clustering import SEM_MAX_CLUSTER

        def pair_space(assigned, cap=None) -> int:
            """Sigma over eligible clusters of |cluster|^2 — the
            candidate-pair space the within-cluster GEMM evaluates."""
            sizes = assigned.groupBy("cid").count()
            if cap is not None:
                sizes = sizes.filter(F.col("count") <= cap)
            row = sizes.agg(F.sum(F.col("count") * F.col("count"))).first()[0]
            return int(row or 0)

        record(
            "semantic_pairs fixed-k8 UNCAPPED", mult,
            timed(lambda: semantic_dedup_pairs_arrow(a8, max_cluster=None).count(),
                  work=pair_space(a8)),
            "(the hazard)",
        )
        record(
            "semantic_pairs fixed-k8 capped(default)", mult,
            timed(lambda: semantic_dedup_pairs_arrow(a8).count(),
                  work=pair_space(a8, SEM_MAX_CLUSTER)),
            "(degenerate clusters dropped)",
        )
        record(
            "semantic_pairs k=codebook_k(n) capped", mult,
            timed(lambda: semantic_dedup_pairs_arrow(ar).count(),
                  work=pair_space(ar, SEM_MAX_CLUSTER)),
            f"(production recipe, k={krule})",
        )
        # LSH graph-build candidate space (no scoring — the pair COUNT
        # is the work driver, and counting the bucket join is JVM-cheap)
        from tripl_spark.operators.similarity import (
            bucket_key,
            lsh_planes,
            n_planes_for,
        )

        def cand_count(planes=None, cap=None) -> int:
            e = emb.withColumn("bucket", bucket_key(F.col("v"), planes))
            side = e
            if cap is not None:
                ok = (
                    e.groupBy("bucket").count()
                    .filter(F.col("count") <= cap).select("bucket")
                )
                side = e.join(F.broadcast(ok), "bucket")
            from tripl_spark.operators.graph_ann import _multiprobe
            from tripl_spark.operators.similarity import N_PLANES

            np_ = N_PLANES if planes is None else len(planes)
            probes = _multiprobe(e, n_planes=np_).select(
                F.col("vec_id").alias("src"), "pb"
            )
            return probes.join(
                side.select(F.col("vec_id").alias("dst"), "bucket"),
                (F.col("pb") == F.col("bucket")) & (F.col("src") != F.col("dst")),
            ).count()

        t0 = time.perf_counter()
        n_unc = cand_count()
        record("lsh_build_candidates fixed-planes UNCAPPED", mult,
               (time.perf_counter() - t0, n_unc), "(the hazard)")
        t0 = time.perf_counter()
        n_cap = cand_count(cap=1000)
        record("lsh_build_candidates fixed-planes capped", mult,
               (time.perf_counter() - t0, n_cap), "(MAX_LSH_BUCKET)")
        kp = n_planes_for(n, per_bucket=PER_CLUSTER)
        t0 = time.perf_counter()
        n_rule = cand_count(planes=lsh_planes(kp, DIM), cap=1000)
        record("lsh_build_candidates n_planes_for(n) capped", mult,
               (time.perf_counter() - t0, n_rule), f"(production rule, planes={kp})")

        # ---- window-skew hazard: per-lang ntile vs broadcast cutoffs
        # (skewed 80/20 lang mix — the dominant-language shape of a
        # real web corpus). The hazard is SERIALIZATION, not work
        # growth: ntile puts the dominant lang's whole row set through
        # ONE sort task, so its "work" metric is max rows through any
        # single window task — alpha ~ 1 means the single task's input
        # grows linearly with corpus size (unbounded at 100 TB), while
        # the cutoff twin's stays flat at the sample cap.
        from pyspark.sql import Window

        from tripl_spark.operators.curation import deterministic_sample, stratum_quota
        from tripl_spark.operators.text import (
            PPL_SAMPLE_CAP,
            PPL_SAMPLE_PCT,
            assign_ppl_buckets,
            perplexity_cutoffs,
        )

        n_sk = 50_000 * mult
        stub = (
            spark.range(n_sk)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.pmod("id", 10) < 8, F.lit("en"))
                .when(F.pmod("id", 10) == 8, F.lit("de"))
                .otherwise(F.lit("fr"))
                .alias("lang"),
                (F.pmod(F.col("id") * F.lit(2654435761), F.lit(1000003))
                 / 1000003.0).alias("avg_logprob"),
            )
            .localCheckpoint(eager=True)
        )
        w_nt = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
        max_lang = stub.groupBy("lang").count().agg(F.max("count")).first()[0]
        record(
            "ppl_bucketing per-lang ntile (exact)", mult,
            timed(lambda: stub.select(F.ntile(3).over(w_nt).alias("b"))
                  .filter(F.col("b") <= 2).count(),
                  work=int(max_lang)),
            "(the hazard: dominant lang on ONE task)",
        )
        capped_max = (
            stratum_quota(
                deterministic_sample(stub, "doc_id", PPL_SAMPLE_PCT),
                ["lang"], "doc_id", PPL_SAMPLE_CAP,
            )
            .groupBy("lang").count().agg(F.max("count")).first()[0]
        )
        record(
            "ppl_bucketing broadcast-cutoff (twin)", mult,
            timed(lambda: assign_ppl_buckets(stub, perplexity_cutoffs(stub))
                  .filter(F.col("ppl_bucket") <= 2).count(),
                  work=int(capped_max)),
            f"(max window-task rows capped at {PPL_SAMPLE_CAP})",
        )

        # ---- co-purchase link-prediction pair hazard: hub parts.
        # Edges 80% spread over a 2000-part catalog, 20% concentrated
        # on 20 hub parts (bestsellers whose buyer count grows WITH the
        # corpus). The part-keyed self-join's candidate space is
        # Sigma|part|^2: with a FIXED catalog it's quadratic; the
        # LINK_MAX_PART hub cap bounds the degenerate keys (and, like
        # the LSH cap, collapses everything once even honest parts
        # outgrow it — a guard, not a scaling strategy); the production
        # analog of the occupancy rules is CATALOG GROWTH (parts scale
        # with edges, occupancy constant -> linear).
        from tripl_spark.queries.graph_queries import LINK_MAX_PART

        n_e = 20_000 * mult

        def copurchase_edges(n_parts: int, n_hubs: int):
            return (
                spark.range(n_e)
                .select(
                    F.col("id").alias("cust"),
                    F.when(F.pmod("id", 10) < 8,
                           F.pmod(F.col("id") * 7919, F.lit(n_parts)))
                    .otherwise(F.pmod(F.col("id") * 104729, F.lit(n_hubs)) + n_parts)
                    .alias("part"),
                )
                .localCheckpoint(eager=True)
            )

        def pair_work(edges, cap=None) -> int:
            sizes = edges.groupBy("part").count()
            if cap is not None:
                sizes = sizes.filter(F.col("count") <= cap)
            row = sizes.agg(F.sum(F.col("count") * F.col("count"))).first()[0]
            return int(row or 0)

        def pair_count(edges, cap=None) -> int:
            e = edges
            if cap is not None:
                kept = e.groupBy("part").count().filter(F.col("count") <= cap).select("part")
                e = e.join(F.broadcast(kept), "part")
            a = e.select(F.col("cust").alias("ca"), "part")
            b = e.select(F.col("cust").alias("cb"), "part")
            return a.join(b, "part").filter(F.col("ca") < F.col("cb")).count()

        fixed = copurchase_edges(2000, 20)
        record("copurchase_pairs fixed-catalog UNCAPPED", mult,
               timed(lambda: pair_count(fixed), work=pair_work(fixed)),
               "(the hazard)")
        record("copurchase_pairs fixed-catalog hub-capped", mult,
               timed(lambda: pair_count(fixed, LINK_MAX_PART),
                     work=pair_work(fixed, LINK_MAX_PART)),
               f"(LINK_MAX_PART={LINK_MAX_PART})")
        grown = copurchase_edges(2000 * mult, 20 * mult)
        record("copurchase_pairs catalog-grows-with-n", mult,
               timed(lambda: pair_count(grown), work=pair_work(grown)),
               "(production: constant occupancy)")

        # ---- reference containment: claimed shape is two LINEAR gram
        # streams (candidate shingles, reference distinct shingles) +
        # an N:1 left join on the gram key + one groupBy(doc) — no
        # pair stage. Crucially, even a HOT gram (the same 3-gram
        # opening 50% of all docs) cannot expand the join: the ref
        # side is DISTINCT, exactly one row per gram, so the join
        # stays N:1 whatever the gram's document frequency (contrast
        # the LSH/copurchase hazards where both join sides grow).
        # Work driver = candidate gram rows + ref gram-stream rows
        # (the two shuffle inputs).
        from tripl_spark.operators.dedup import shingle_frame

        n_docs_c = 5_000 * mult

        def containment_docs(hot: bool):
            toks = F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(i * 7919 + F.col("doc_id") * 81, F.lit(2000))
                    .cast("string"),
                ),
            )
            if hot:
                toks = F.when(
                    F.pmod("doc_id", 2) == 0,
                    F.concat(
                        F.array(F.lit("h0"), F.lit("h0"), F.lit("h0"),
                                F.lit("h0")),
                        F.slice(toks, 5, 36),
                    ),
                ).otherwise(toks)
            return (
                spark.range(n_docs_c)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(" ", toks).alias("text"),
                )
                .localCheckpoint(eager=True)
            )

        def containment_count(docs_c) -> int:
            cand = shingle_frame(docs_c.filter(F.pmod("doc_id", 5) == 0))
            ref = (
                shingle_frame(docs_c.filter(F.pmod("doc_id", 5) != 0))
                .select("g").distinct().withColumn("_hit", F.lit(1))
            )
            return (
                cand.join(ref, "g", "left")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .count()
            )

        def containment_work(docs_c) -> int:
            """The two gram-shuffle inputs (candidate + reference
            shingle streams) — what the join actually moves."""
            cand = shingle_frame(docs_c.filter(F.pmod("doc_id", 5) == 0))
            ref_stream = shingle_frame(docs_c.filter(F.pmod("doc_id", 5) != 0))
            return cand.count() + ref_stream.count()

        for hot, tag, note in (
            (False, "uniform grams", "(two linear gram shuffles, N:1 join)"),
            (True, "hot-gram skew", "(one 3-gram in 50% of docs: ref side "
             "distinct -> join stays N:1)"),
        ):
            dc = containment_docs(hot)
            record(
                f"reference_containment {tag}", mult,
                timed(lambda dc=dc: containment_count(dc),
                      work=containment_work(dc)),
                note,
            )

        # ---- LPA round: claimed shape is ONE edge-sized shuffle (the
        # vote rows) + a partial-aggregable max_by argmax — no windows,
        # so even a hub whose degree grows WITH n (here node 0 gains an
        # edge from 10% of all nodes) adds map-side-combinable
        # (node,label) keys, never a single-task sort. Work driver =
        # |sym| (the vote-join input); linear alpha_time past the job
        # floor is the claim.
        from tripl_spark.queries.graph_queries import lpa_round

        n_nodes = 20_000 * mult
        tree = spark.range(1, n_nodes).select(
            F.col("id").alias("src"), (F.col("id") / 2).cast("long").alias("dst")
        )
        hub = spark.range(1, n_nodes).filter(F.pmod("id", 10) == 3).select(
            F.col("id").alias("src"), F.lit(0).cast("long").alias("dst")
        )
        edges = tree.unionByName(hub)
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().localCheckpoint(eager=True)
        labels0 = sym.select(F.col("src").alias("node")).distinct() \
            .withColumn("label", F.col("node")).localCheckpoint(eager=True)
        record("lpa_round hub-skewed (one round)", mult,
               timed(lambda: lpa_round(sym, labels0).count(), work=sym.count()),
               "(hub degree grows with n; work = vote rows = |sym|)")

        # ---- entity-resolution (S7 id_attrs upsert): re-ingest a
        # FIXED-size batch against a store of M entities at 1x/10x/30x
        # M. The hazard is the store-derived eid mapping (O(M) rows):
        # broadcast verbatim it couples batch cost to store size; the
        # production path semi-joins it down to the batch's minted
        # eids first, so the broadcast — and the resolution cost —
        # is batch-bounded (alpha_work 0 vs the unpruned 1.0).
        from tripl_spark.sources.json_bulk import remap_to_existing

        m_ents = 50_000 * mult
        store = spark.range(m_ents).select(
            F.concat(F.lit("ent-"), F.col("id").cast("string")).alias("e"),
            F.lit("x:id").alias("a"), F.lit("string").alias("vtype"),
            F.concat(F.lit("id-"), F.col("id").cast("string")).alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
            F.lit(None).cast("boolean").alias("v_bool"),
            F.lit(0).cast("long").alias("t"),
        ).localCheckpoint(eager=True)
        from tripl_spark.functions.ids import deterministic_eid_col

        batch_n = 2_000  # FIXED batch whatever the store size
        batch = spark.range(batch_n).select(
            ((F.col("id") * 17) % m_ents).alias("id")  # spread across ids
        ).select(
            deterministic_eid_col(
                "x:id", F.concat(F.lit("id-"), F.col("id").cast("string"))
            ).alias("e"),
            F.lit("x:id").alias("a"), F.lit("string").alias("vtype"),
            F.concat(F.lit("id-"), F.col("id").cast("string")).alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
            F.lit(None).cast("boolean").alias("v_bool"),
            F.lit(0).cast("long").alias("t"),
        ).localCheckpoint(eager=True)
        record("id_attrs remap, unpruned mapping (hazard)", mult,
               (0.0, store.filter(F.col("a") == "x:id").count()),
               "(mapping rows broadcast by the naive shape = O(M))")
        record("id_attrs remap, batch-pruned (production)", mult,
               timed(lambda: remap_to_existing(batch, store, ["x:id"]).count(),
                     work=batch_n),
               "(fixed 2k-doc batch; broadcast bounded by batch)")

        # ---- image dHash banding: 4 x 16-bit pigeonhole bands. Band
        # keys are CONTENT-correlated, not uniform: a solid-color /
        # boilerplate family shares ONE dhash, so 30% degenerate mass
        # is a single quadratic class in the band join. The
        # IMAGE_BAND_MAX_BUCKET cap drops degenerate keys BEFORE
        # pairing; the uniform residue keeps Sigma|bucket|^2 ~ n +
        # n^2/2^16 (key space 65536/band — collision mass negligible
        # until n approaches it). Work driver = Sigma eligible
        # |bucket|^2 over the 4 bands; time = emitted pair count.
        from tripl_spark.operators.multimodal import (
            IMAGE_BAND_MAX_BUCKET,
            image_near_dup_pairs,
        )

        n_img = 2_000 * mult

        def synth_hashes(n: int, bits: int, degenerate_pct: int,
                         id_col: str = "doc_id", sig: str = "dhash"):
            """n synthetic signatures: murmur-bit uniform strings, with
            ``degenerate_pct``% of ids collapsed onto the all-zeros
            signature (the solid-color / silence class)."""
            rand = F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(bits - 1)),
                    lambda i: F.pmod(F.abs(F.hash(F.col("id"), i)), F.lit(2))
                    .cast("string"),
                ),
            )
            sig_col = (
                F.when(F.pmod("id", 100) < degenerate_pct, F.lit("0" * bits))
                .otherwise(rand)
                if degenerate_pct
                else rand
            )
            return spark.range(n).select(
                F.col("id").alias(id_col), sig_col.alias(sig)
            ).localCheckpoint(eager=True)

        def band_space(sigs, sig: str, n_bands: int, width: int,
                       cap: int | None) -> int:
            """Sigma over eligible (band, key) buckets of |bucket|^2 —
            the candidate space the band equi-join evaluates."""
            b = sigs.select(
                F.explode(
                    F.array(*[
                        F.substring(sig, i * width + 1, width)
                        .alias("k") for i in range(n_bands)
                    ])
                ).alias("k"),
                F.lit(1).alias("one"),
            )
            sizes = b.groupBy("k").agg(F.count("one").alias("c"))
            if cap is not None:
                sizes = sizes.filter(F.col("c") <= cap)
            row = sizes.agg(F.sum(F.col("c") * F.col("c"))).first()[0]
            return int(row or 0)

        img_uni = synth_hashes(n_img, 64, 0)
        img_hot = synth_hashes(n_img, 64, 30)
        record("image_band_pairs uniform uncapped", mult,
               timed(lambda: image_near_dup_pairs(img_uni, max_bucket=None).count(),
                     work=band_space(img_uni, "dhash", 4, 16, None)),
               "(16-bit keys: collision mass ~ n^2/2^16, tiny)")
        # the degenerate class would MATERIALIZE (0.3n)^2/2 pairs —
        # 162M at the 30x point — so the hazard row is arithmetic
        # work only (the id_attrs-unpruned precedent), and the timed
        # row is the capped path that exists to prevent it.
        record("image_band_pairs 30%-degenerate UNCAPPED", mult,
               (0.0, band_space(img_hot, "dhash", 4, 16, None)),
               "(the hazard: one solid-color class = (0.3n)^2; work only)")
        record("image_band_pairs 30%-degenerate capped", mult,
               timed(lambda: image_near_dup_pairs(img_hot).count(),
                     work=band_space(img_hot, "dhash", 4, 16,
                                     IMAGE_BAND_MAX_BUCKET)),
               f"(IMAGE_BAND_MAX_BUCKET={IMAGE_BAND_MAX_BUCKET})")

        # ---- audio fingerprint banding: 4 x 16-bit bands over the
        # 64-bit energy-delta print (widened in r12 from 4 x 8-bit /
        # 32-bit, whose 256-key band space the r11 probe measured at
        # alpha_work 1.96 on a UNIFORM corpus — saturated, so the
        # bucket cap was dropping non-degenerate mass). With 65,536
        # keys per band the uniform occupancy stays <<1 per bucket at
        # every probed size, so the expectation is alpha_work ~= 1
        # (pair mass ~ n^2/2^16 is negligible next to the linear band
        # rows) and the cap back on degenerate-only duty, matching
        # the image twin.
        from tripl_spark.operators.multimodal import (
            AUDIO_BAND_MAX_BUCKET,
            AUDIO_BAND_WIDTH,
            AUDIO_FP_WINDOWS,
            AUDIO_NEARDUP_BANDS,
            audio_near_dup_pairs,
        )

        n_aud = 2_000 * mult  # same scale as the image probe: 16-bit
        # keys keep the uniform candidate join countable at 30x
        aud_uni = synth_hashes(n_aud, AUDIO_FP_WINDOWS, 0, sig="fingerprint")
        aud_hot = synth_hashes(n_aud, AUDIO_FP_WINDOWS, 30, sig="fingerprint")
        record("audio_band_pairs uniform uncapped (16-bit)", mult,
               timed(lambda: audio_near_dup_pairs(aud_uni, max_bucket=None).count(),
                     work=band_space(aud_uni, "fingerprint",
                                     AUDIO_NEARDUP_BANDS, AUDIO_BAND_WIDTH,
                                     None)),
               "(16-bit keys: collision mass ~ n^2/2^16, tiny)")
        record("audio_band_pairs 30%-silence UNCAPPED (16-bit)", mult,
               (0.0, band_space(aud_hot, "fingerprint",
                                AUDIO_NEARDUP_BANDS, AUDIO_BAND_WIDTH, None)),
               "(the hazard: silence class = (0.3n)^2; work only)")
        record("audio_band_pairs 30%-silence capped (16-bit)", mult,
               timed(lambda: audio_near_dup_pairs(aud_hot).count(),
                     work=band_space(aud_hot, "fingerprint",
                                     AUDIO_NEARDUP_BANDS, AUDIO_BAND_WIDTH,
                                     AUDIO_BAND_MAX_BUCKET)),
               f"(AUDIO_BAND_MAX_BUCKET={AUDIO_BAND_MAX_BUCKET})")

        # ---- PCA sufficient statistics: the covariance GEMM pass
        # claims O(batches·d²) shuffle ROWS whatever n is — the
        # reduced partial frame is ≤ d²+d+1 keys, so alpha_work must
        # be ~0 while the (embarrassingly parallel) scan time grows
        # at most linearly past the job floor. Work driver = the rows
        # the groupBy shuffle EMITS (what a 1000-executor reduce
        # actually moves to the driver-side eigh).
        from tripl_spark.operators.pca import (
            covariance_matrix,
            covariance_partials,
        )

        emb_v = emb.select("v")
        record(
            "pca_covariance_gemm sufficient-stats", mult,
            timed(lambda: int(covariance_matrix(
                covariance_partials(emb_v))[2]),
                  work=covariance_partials(emb_v).count()),
            "(reduced shuffle keys <= d^2+d+1 — constant in n)",
        )

        # ---- video group resolution: frame-hash buckets -> edges ->
        # CC. The r9 optimization replaces the within-bucket pair
        # CLIQUE (|bucket|^2 edges — quadratic on a boilerplate intro
        # frame shared by 10% of videos) with STAR edges to the
        # bucket's min doc (|bucket| edges), identical components
        # (property-tested in test_image_dedup). Work driver = edge
        # rows entering CC; the clique row is computed arithmetically
        # for contrast, never materialized.
        from tripl_spark.plans.graph import connected_components

        n_vid = 5_000 * mult
        fh = (
            spark.range(n_vid)
            .select(
                F.col("id").alias("doc_id"),
                F.explode(
                    F.array(*[
                        # 3 unique frames per video + a boilerplate
                        # intro frame on 10% of them
                        *[F.concat(F.lit(f"u{j}-"), F.col("id").cast("string"))
                          for j in range(3)],
                        F.when(F.pmod("id", 10) == 0, F.lit("INTRO"))
                        .otherwise(
                            F.concat(F.lit("u3-"), F.col("id").cast("string"))
                        ),
                    ])
                ).alias("fhash"),
            )
            .localCheckpoint(eager=True)
        )
        clique_pairs = int(
            fh.groupBy("fhash").count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).first()[0]
        )
        mins = fh.groupBy("fhash").agg(F.min("doc_id").alias("root"))
        stars = (
            fh.join(mins, "fhash")
            .filter(F.col("doc_id") != F.col("root"))
            .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
            .distinct()
        )
        nodes = spark.range(n_vid).select(F.col("id").alias("node"))
        record("video_groups star-edge CC", mult,
               timed(lambda: connected_components(stars, nodes=nodes).count(),
                     work=stars.count()),
               f"(clique would be {clique_pairs} pair rows)")
        record("video_groups pair-clique (hazard, arithmetic)", mult,
               (0.0, clique_pairs),
               "(|bucket|^2 on the 10% intro frame — never materialized)")

        # ---- pull_many assembly paths: driver loop vs cluster-side
        # JSON (the PULL_DISTRIBUTED_THRESHOLD auto-switch). Both end
        # driver-resident by contract (list of dicts), so the probe
        # separates the three cost shapes: the driver loop's Python
        # re-nesting (alpha ~ 1 with the big constant the threshold
        # exists for), the distributed path through the same contract
        # (cluster assembly + one json.loads per doc), and the pure
        # cluster path pull_df().count() — what a parquet sink would
        # pay, no driver materialization at all. Work driver = root
        # count. The nested expression routes through the path-keyed
        # assembly (pull_json_paths_df) — r13 removed the separate
        # safety BFS; the traversal IS the assembly now.
        from tripl_spark.core.store import TripleStore

        n_roots = 2_000 * mult
        pull_schema = {"p:kid": {"db:valueType": "db.type:ref"}}
        ts = TripleStore(schema=pull_schema,
                         default_cardinality="db.cardinality:one", spark=spark)
        n_kids = max(1, n_roots // 2)
        ts.assert_facts(
            [{"db:ident": f"c-{j}", "k:id": f"kid-{j}"} for j in range(n_kids)]
            + [
                {
                    "db:ident": f"r-{i}",
                    "p:name": f"name-{i % 97}",
                    "p:score": i,
                    "p:kid": f"c-{i % n_kids}",
                }
                for i in range(n_roots)
            ]
        )
        ts.compact()  # checkpoint ingestion so the probe times pull only
        pull_roots = [f"r-{i}" for i in range(n_roots)]
        pull_expr = ["p:name", "p:score", {"p:kid": ["k:id"]}]
        record(
            "pull_many driver-loop assembly", mult,
            timed(lambda: len(ts.pull_many(pull_expr, pull_roots,
                                           distributed=False)),
                  work=n_roots),
        )
        def _auto_pull() -> int:
            # what the auto path pays: cluster assembly (r15: the
            # auto-switch has no shape gate left — every expression
            # takes a distributed assembly past the threshold)
            return len(ts.pull_many(pull_expr, pull_roots, distributed=True))

        record(
            "pull_many distributed assembly (auto path)", mult,
            timed(_auto_pull, work=n_roots),
            "(path-keyed assembly, r13: no separate safety BFS)",
        )
        record(
            "pull_df cluster-only (sink path, no collect)", mult,
            timed(lambda: ts.pull_df(pull_expr, pull_roots).count(),
                  work=n_roots),
        )

        # ---- r13: CYCLIC store through the same contract. Roots are
        # ref-PAIRS (r-i <-> r-(i^1)), so every depth-2 path revisits
        # its root — the exact shape r12 paid the detection BFS for
        # and then ran the driver loop on anyway. The r13 path-keyed
        # assembly emits the driver's ancestor stubs cluster-side.
        cyc_schema = {"p:peer": {"db:valueType": "db.type:ref"}}
        ts_c = TripleStore(schema=cyc_schema,
                           default_cardinality="db.cardinality:one",
                           spark=spark)
        ts_c.assert_facts(
            [
                {
                    "db:ident": f"r-{i}",
                    "p:name": f"name-{i % 97}",
                    "p:peer": f"r-{i ^ 1}",
                }
                for i in range(n_roots)
            ]
        )
        ts_c.compact()
        cyc_expr = ["p:name", {"p:peer": ["p:name", {"p:peer": ["p:name"]}]}]
        record(
            "pull_many CYCLIC pairs, driver loop", mult,
            timed(lambda: len(ts_c.pull_many(cyc_expr, pull_roots,
                                             distributed=False)),
                  work=n_roots),
        )
        record(
            "pull_many CYCLIC pairs, distributed path (r13)", mult,
            timed(lambda: len(ts_c.pull_many(cyc_expr, pull_roots,
                                             distributed=True)),
                  work=n_roots),
            "(every depth-2 path stubs; r12 fell back to the loop here)",
        )

        # ---- PII scrub (r13): map-only JVM regex scrub + per-class
        # counts — no shuffle, so alpha_time must be ~1 past the job
        # floor and alpha_work exactly 1 (one row per doc). Planted
        # text mirrors the registered query's density.
        from tripl_spark.operators.pii import pii_counts, scrub_pii

        n_pii = 20_000 * mult
        base_txt = " ".join(f"tok{j}" for j in range(60))
        pii_docs = spark.range(n_pii).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(base_txt),
                F.when(F.pmod("id", 3) == 0,
                       F.concat(F.lit(" mail u"), F.col("id").cast("string"),
                                F.lit("@ex.org"))).otherwise(F.lit("")),
                F.when(F.pmod("id", 3) == 1,
                       F.concat(F.lit(" card 4111 1111 1111 111"),
                                F.pmod("id", 10).cast("string"))
                       ).otherwise(F.lit("")),
                F.when(F.pmod("id", 5) == 0,
                       F.lit(" call +1 (555) 010-1234")).otherwise(F.lit("")),
            ).alias("text"),
        ).localCheckpoint(eager=True)
        record(
            "pii scrub+counts map-only (r13)", mult,
            timed(lambda: pii_docs.select(
                "doc_id", *pii_counts(F.col("text")),
                F.length(scrub_pii(F.col("text"))).alias("sl"),
            ).agg(F.sum("n_email"), F.sum("n_cc"), F.sum("sl")).first()
                and n_pii,
                  work=n_pii),
            "(single scan, codegen regex, zero Exchange)",
        )

        # ---- URL curation (r14): the host scan is map-only (JVM
        # parse_url in codegen — alpha_time ~1 past the job floor,
        # alpha_work exactly 1), and the quota is ONE domain-keyed
        # shuffle whose work is n rows however skewed the head
        # domains are (the window emits rank metadata, never pairs).
        # Planted mix mirrors the registered query: 3 head domains
        # take ~60% of rows — the skew the quota exists to cap.
        from pyspark.sql.window import Window as _W

        from tripl_spark.operators.urls import _url_col, url_components

        n_url = 20_000 * mult
        url_docs = spark.range(n_url).select(
            F.col("id").alias("doc_id"),
            F.lit("s").alias("source"),
            F.lit("en").alias("lang"),
            F.pmod("id", 997).cast("int").alias("n_chars"),
        ).localCheckpoint(eager=True)
        parsed = url_components(url_docs, _url_col())
        record(
            "url host scan map-only (r14)", mult,
            timed(lambda: parsed.count(), work=n_url),
            "(single scan, parse_url codegen, zero Exchange)",
        )
        _wq = _W.partitionBy("reg_domain").orderBy(
            F.col("n_chars").desc(), F.col("doc_id")
        )
        record(
            "url domain quota window (r14)", mult,
            timed(lambda: parsed.select(
                "doc_id", "reg_domain",
                F.row_number().over(_wq).alias("rk")).count(),
                  work=n_url),
            "(one domain-keyed exchange; 3 head domains ~60% of rows)",
        )

        # ---- unicode normalization (r14): the Arrow-batched NFC
        # stage is the cost under test — map-only Python, so
        # alpha_work is exactly 1 and alpha_time approaches 1 once
        # the per-batch Arrow transfer amortizes the job floor.
        from tripl_spark.operators.text import normalize_text

        norm_docs = spark.range(n_url).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(base_txt),
                F.when(F.pmod("id", 4) == 1,
                       F.lit(" cafe\u0301 blase\u0301")).otherwise(F.lit("")),
                F.when(F.pmod("id", 5) == 2,
                       F.lit(" l1\r\nl2")).otherwise(F.lit("")),
            ).alias("text"),
        ).localCheckpoint(eager=True)
        record(
            "nfc normalize arrow scan (r14)", mult,
            timed(lambda: norm_docs.select(
                F.length(normalize_text(F.col("text"))).alias("L"))
                .agg(F.sum("L")).first() and n_url,
                  work=n_url),
            "(map-only; ArrowEvalPython is the only Python stage)",
        )

        if mult not in (1, SCALE):
            continue  # docs-side + registered queries: 1x/10x only
        record(
            "sim_ann_ivf_kmeans (registered)", mult,
            timed(lambda: REGISTRY["sim_ann_ivf_kmeans"].fn(spark, d).count()),
        )

        docs = load_table(spark, d, "documents")
        cut = int(DOC_N1 * mult * 0.8)
        corpus = docs.filter(F.col("doc_id") < cut)
        shard = docs.filter(F.col("doc_id") >= cut)
        record(
            "minhash_match_new 80/20 (production)", mult,
            timed(lambda: minhash_match_new(corpus, shard).count()),
        )
        record(
            "dedup_incremental_minhash (registered)", mult,
            timed(lambda: REGISTRY["dedup_incremental_minhash"].fn(spark, d).count()),
        )

        # ---- C4-style line dedup (r12): two keyed shuffles, keeper
        # table per-DISTINCT-line. Work driver = exploded line rows
        # (linear in corpus tokens / LINE_TOKENS). The hot variant
        # prepends the SAME 16-token boilerplate line to half the
        # docs — the claim under test is that a line in 50% of the
        # corpus stays ONE keeper row and the join back is N:1 (the
        # containment cost class), so the hot run sits on the uniform
        # run's line, not a quadratic one.
        import tripl_spark.operators.dedup as _D

        line_work = int(
            REGISTRY["dedup_lines_global"].fn(spark, d)
            .agg(F.sum("n_lines")).first()[0]
        )
        record(
            "dedup_lines_global (registered)", mult,
            timed(lambda: REGISTRY["dedup_lines_global"].fn(spark, d).count(),
                  work=line_work),
        )
        boiler = " ".join(f"boiler{j}" for j in range(16))
        hot_docs = load_table(spark, d, "documents").withColumn(
            "text",
            F.when(F.pmod("doc_id", 2) == 0,
                   F.concat(F.lit(boiler + " "), F.col("text")))
            .otherwise(F.col("text")),
        ).localCheckpoint(eager=True)
        _orig_lt = _D.load_table
        _D.load_table = lambda sp, sf, name: hot_docs
        try:
            hot_work = int(
                _D.dedup_lines_global(spark, d)
                .agg(F.sum("n_lines")).first()[0]
            )
            record(
                "dedup_lines_global hot-line 50% (skew)", mult,
                timed(lambda: _D.dedup_lines_global(spark, d).count(),
                      work=hot_work),
                "(one boilerplate line in half the docs: keeper stays 1 row, join N:1)",
            )
        finally:
            _D.load_table = _orig_lt

        # ---- newline-splitter twin (r13): same keeper core, real
        # newline lines. The registered query ALREADY plants the skew
        # (a shared header line in 1/6 of docs, footer in 1/4), so the
        # registered run is the boilerplate case: each shared line is
        # ONE keeper row, join back N:1.
        nl_work = int(
            REGISTRY["dedup_lines_newline"].fn(spark, d)
            .agg(F.sum("n_lines")).first()[0]
        )
        record(
            "dedup_lines_newline (registered; boilerplate 1/6+1/4)", mult,
            timed(lambda: REGISTRY["dedup_lines_newline"].fn(spark, d).count(),
                  work=nl_work),
            "(shared header/footer lines stay one keeper row each)",
        )

    print("\nObserved scaling exponents (1=linear, 2=quadratic):")
    print(f"  {'operator':44s} {'alpha_time':>10s} {'alpha_work':>10s}  points")

    def slope(xs: list[float], ys: list[float]) -> float:
        lx = [math.log(x) for x in xs]
        ly = [math.log(max(y, 1e-9)) for y in ys]
        mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
        num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
        den = sum((a - mx) ** 2 for a in lx)
        return num / den

    for name, by_mult in results.items():
        mults = sorted(by_mult)
        at = slope(mults, [by_mult[m][0] for m in mults])
        aw = slope(mults, [by_mult[m][1] for m in mults])
        pts = " ".join(
            f"x{m}:{by_mult[m][0]:.2f}s/{by_mult[m][1]}r" for m in mults
        )
        print(f"  {name:44s} {at:10.2f} {aw:10.2f}  {pts}")


if __name__ == "__main__":
    main()
