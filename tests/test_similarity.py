"""ANN quality: the banded sign-LSH path must actually find near
neighbors.  Everything is deterministic (md5-seeded hyperplanes, fixed
fixtures), so the assertions are exact, not statistical."""

from __future__ import annotations

from kafka_go_cardinality_spark.operators import similarity as sim
from kafka_go_cardinality_spark.sources import load_table

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def test_ann_finds_planted_neighbors(spark, sf_dir):
    """Vectors with a genuinely-near planted twin (cos ≈ 0.99) must
    retrieve it through the banded LSH — this is the recall property that
    matters for near-dup detection; recall on random near-orthogonal
    vectors is meaningless by comparison."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = sim.with_planted_neighbors(emb).select("vec_id", "embedding")
    res = sim.ann_lsh_topk(corpus, n_queries=56, k=5)
    got = {(r.query_id, r.neighbor_id) for r in res.collect()}
    planted = [i for i in range(56) if i % 11 == 0]
    assert all((q, q + 1_000_000) in got for q in planted)


def test_ivf_finds_planted_neighbors(spark, sf_dir):
    """The IVF path must also retrieve genuinely-near planted twins: a
    near-identical vector lands in the same (or a probed) centroid
    cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = sim.with_planted_neighbors(emb).select("vec_id", "embedding")
    res = sim.ivf_topk(corpus, n_queries=56, k=5)
    got = {(r.query_id, r.neighbor_id) for r in res.collect()}
    planted = [i for i in range(56) if i % 11 == 0]
    assert all((q, q + 1_000_000) in got for q in planted)


def test_ivf_overlaps_exact_topk(spark, sf_dir):
    """Probing 4/16 cells must still capture a meaningful share of the
    exact top-k on the raw corpus."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_sim_cosine_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_sim_ann_ivf"](spark, sf_dir).collect()
    }
    assert len(exact & ivf) / len(exact) >= 0.25


def test_ann_overlaps_exact_topk(spark, sf_dir):
    """On the raw corpus the banded candidates still overlap the exact
    top-k meaningfully (single-bucket LSH at 12 planes returned ~nothing
    — recall floor pins the banding)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_sim_cosine_topk"](spark, sf_dir).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["q_sim_ann_lsh"](spark, sf_dir).collect()
    }
    assert len(ann) == len(exact)  # k rows per query either way
    assert len(exact & ann) / len(exact) >= 0.10


def test_ann_scores_match_exact_for_shared_pairs(spark, sf_dir):
    """Re-ranking is exact: any (query, neighbor) the ANN shares with the
    brute-force twin carries the identical rounded cosine."""
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in QUERIES["q_sim_cosine_topk"](spark, sf_dir).collect()
    }
    for r in QUERIES["q_sim_ann_lsh"](spark, sf_dir).collect():
        if (r.query_id, r.neighbor_id) in exact:
            assert r.cos == exact[(r.query_id, r.neighbor_id)]


def test_kmeans_matches_pure_python_model(spark):
    """The integer-exact trainer must agree with a from-scratch Python
    implementation of the same spec (init = first k by id, micro-unit
    quantization, squared-L2 argmin with low-id ties, half-away-from-zero
    integer means) — bit-identical centroids and cluster sizes."""
    from kafka_go_cardinality_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_Q,
        _int_div_round,
        kmeans_fit,
    )
    from kafka_go_cardinality_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
    )
    import decimal

    def q6(x: float) -> int:
        # Spark round() = BigDecimal HALF_UP on the double value.
        return int(
            decimal.Decimal(float(x) * KMEANS_Q).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )

    vecs = {r["vec_id"]: [q6(x) for x in r["embedding"]] for r in rows}
    cents = [vecs[i] for i in range(KMEANS_K)]

    def assign_all():
        out = {}
        for vid, v in vecs.items():
            best, best_d = None, None
            for ci, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(v, c))
                if best_d is None or d < best_d:  # ties keep the lower ci
                    best, best_d = ci, d
            out[vid] = best
        return out

    sizes = {}
    for _ in range(KMEANS_ITERS):
        a = assign_all()
        sizes = {}
        for ci in range(KMEANS_K):
            members = [vecs[vid] for vid, c in a.items() if c == ci]
            if not members:
                continue
            sizes[ci] = len(members)
            cents[ci] = [
                _int_div_round(sum(col), len(members))
                for col in zip(*members)
            ]
    # Spec: the FINAL E-step's clusters with their M-step means — sizes
    # from the last iteration's assignment, centroids the means of it.
    expected = {
        ci: (sizes[ci], ",".join(str(x) for x in cents[ci]))
        for ci in sorted(sizes)
    }
    got = {
        r["cluster"]: (r["n_vectors"], r["centroid_q6"])
        for r in kmeans_fit(emb).collect()
    }
    assert got == expected


def test_kmeans_corpus_smaller_than_k(spark):
    """A corpus with fewer than k vectors fits a smaller model instead of
    indexing past the seed list: 1 vector -> exactly 1 cluster whose
    centroid is that vector's quantization (fixed point of the mean)."""
    from kafka_go_cardinality_spark.operators.similarity import (
        KMEANS_Q,
        kmeans_fit,
    )
    import decimal

    # 64-dim per the family contract (ragged vectors are excluded since
    # the oracle landed — they have no distance to a 64-dim centroid)
    vec = ([0.5, -0.25, 0.125] * 22)[:64]
    emb = spark.createDataFrame(
        [(0, vec)], "vec_id bigint, embedding array<double>"
    )
    rows = kmeans_fit(emb).collect()
    assert len(rows) == 1
    q6 = lambda x: int(  # noqa: E731
        decimal.Decimal(float(x) * KMEANS_Q).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert rows[0]["cluster"] == 0
    assert rows[0]["n_vectors"] == 1
    assert rows[0]["centroid_q6"] == ",".join(str(q6(x)) for x in vec)


def test_pq_selected_neighbors_beat_average(spark, sf_dir):
    """PQ/ADC ranking-quality floor: for every probe, the mean TRUE
    squared L2 distance of the PQ-selected top-k must be well below the
    probe's mean distance over the whole corpus — a quantized index
    whose picks look like random draws is broken, whatever its
    estimates say."""
    from kafka_go_cardinality_spark.operators.similarity import pq_topk
    from kafka_go_cardinality_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    picks: dict[int, list[int]] = {}
    for r in pq_topk(emb).collect():
        picks.setdefault(r["query_id"], []).append(r["vec_id"])

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assert len(picks) == 10
    # Calibration on this fixture (near-uniform random embeddings, weak
    # NN structure): EXACT top-5 achieves ratio ≈ 0.68; PQ lands
    # 0.71-0.86; a random picker sits at 1.0 ± 0.035 on the mean.
    ratios = []
    for q, chosen in picks.items():
        pv = vecs[q]
        dists = {vid: l2sq(pv, v) for vid, v in vecs.items() if vid != q}
        mean_all = sum(dists.values()) / len(dists)
        mean_sel = sum(dists[v] for v in chosen) / len(chosen)
        ratios.append(mean_sel / mean_all)
        assert mean_sel < 0.9 * mean_all, (q, mean_sel, mean_all)
    assert sum(ratios) / len(ratios) < 0.82, ratios


def test_semantic_dedup_drops_planted_copies(spark, sf_dir):
    """Every planted near-copy (id+1_000_000, cosine ≈ 0.999 to its
    original) must be dropped, and its original kept — the keep-lowest-id
    rule; the kept set never shrinks below corpus minus planted."""
    from kafka_go_cardinality_spark.operators.similarity import semantic_dedup
    from kafka_go_cardinality_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = semantic_dedup(emb).collect()
    kept = {r["vec_id"] for r in rows if r["is_kept"]}
    planted = {r["vec_id"] for r in rows if r["vec_id"] >= 1_000_000}
    assert planted, "fixture must plant near-copies"
    # A planted copy survives ONLY by landing in a different cell than
    # its original (the +0.25 perturbation can flip the argmax) — that
    # escape rate is SemDeDup's recall trade, not a bug.  Floor pinned
    # at 70% caught (deterministic fixture: measured 36/46 at sf0.001).
    caught = {v for v in planted if v not in kept}
    assert len(caught) >= 0.7 * len(planted)
    # Originals always keep: the copy carries the HIGHER id, and random
    # 64-d vectors are near-orthogonal (no other pair reaches 0.95).
    originals = {v - 1_000_000 for v in planted}
    assert originals <= kept


# ---------------------------------------------------------- zero vectors
#
# Round-5 robustness sweep: a single zero (or denormal) embedding used to
# abort SIX similarity queries with an ANSI DIVIDE_BY_ZERO — the vector
# twin of the grams() short-doc crash.  cosine()/cosine_pre()/_cos_sql
# and the generated centroid-score arrays now define cosine as 0.0 for a
# zero-norm operand on BOTH engines; this test pins full oracle parity
# on a corpus where the degenerate vectors are PLANTED.

_ZERO_VEC_QUERIES = [
    "q_sim_cosine_topk",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_sim_knn_classify",
    "q_dedup_embedding",
    "q_dedup_semantic",
]


def test_zero_vector_corpus_full_parity(spark, tmp_path_factory):
    import duckdb

    from kafka_go_cardinality_spark.queries import ORACLE_SQL, QUERIES
    from tests.conftest import assert_frames_match

    d = tmp_path_factory.mktemp("zerovec")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
          UNION ALL
          SELECT 900001, CAST(list_transform(range(64), x -> 0.0) AS FLOAT[]), 3
          UNION ALL
          SELECT 900002, CAST(list_transform(range(64), x -> 1e-30) AS FLOAT[]), 4
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    try:
        for name in _ZERO_VEC_QUERIES:
            spark_pdf = QUERIES[name](spark, str(d)).toPandas()
            oracle_pdf = con.execute(ORACLE_SQL[name]).fetchdf()
            assert_frames_match(spark_pdf, oracle_pdf)
        # rows-only ops must at least complete on the degenerate corpus
        for name in ("q_sim_ann_pq", "q_kmeans"):
            assert QUERIES[name](spark, str(d)).count() >= 0
    finally:
        con.close()


def test_knn_ivf_agrees_with_exact_on_separable_labels(spark):
    """On label-separable data (each label one orthogonal anchor
    direction + small deterministic jitter) the IVF bulk-labeling path
    must predict EXACTLY what the brute-force twin predicts, and both
    must be right — the quality contract of the documented probes≈corpus
    flip.  (On near-orthogonal random fixtures neighbor identity is
    arbitrary, so agreement there is meaningless by comparison.)"""
    rows = []
    for i in range(60):
        lab = i % 3
        v = [0.0] * 64
        v[lab] = 1.0
        v[3 + (i % 57)] = 0.05 + (i % 7) * 0.01
        rows.append((i, v, lab))
    # DUPLICATE probe id: both twins must feed BOTH rows of a
    # duplicated vec_id into the one query group (neither applies a
    # keyed-by-id dedup — the shared held-out definition).  Same label
    # as the original vec_id 5 (5 % 3 == 2) so the merged group keeps
    # one true_label and the assertion stays deterministic.
    dup = [0.0] * 64
    dup[2] = 1.0
    dup[10] = 0.08
    rows.append((5, dup, 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    exact = {
        r["vec_id"]: (r["predicted"], r["correct"])
        for r in sim.knn_classify(df, test_mod=5).collect()
    }
    ivf = {
        r["vec_id"]: (r["predicted"], r["correct"])
        for r in sim.knn_classify_ivf(df, test_mod=5).collect()
    }
    assert len(ivf) == 12
    assert ivf == exact
    assert all(c == 1 for _, c in ivf.values())


def test_knn_ivf_deterministic_on_fixture(spark, sf_dir):
    """Two runs over the md5-seeded fixture corpus give identical
    predictions (no RNG, no scheduling dependence)."""
    one = {
        r["vec_id"]: r["predicted"]
        for r in QUERIES["q_sim_knn_ivf"](spark, sf_dir).collect()
    }
    two = {
        r["vec_id"]: r["predicted"]
        for r in QUERIES["q_sim_knn_ivf"](spark, sf_dir).collect()
    }
    assert one and one == two


def test_scaled_fanout_derivation():
    """Round-7 verdict item 1: fan-out constants must not be pinned to
    the local[32] harness.  The derived count is the floor on narrow
    masters (keeping fixture plans/evidence byte-stable) and the
    scheduling width on wide clusters."""
    from kafka_go_cardinality_spark.partitioning import scaled_fanout

    # narrow master: floor wins
    assert scaled_fanout(8, 64) == 64
    assert scaled_fanout(32, 32) == 32
    # 1000-executor-class cluster: parallelism wins
    assert scaled_fanout(4096, 64) == 4096
    assert scaled_fanout(8000, 32) == 8000


def test_session_fanout_uses_default_parallelism(spark):
    from kafka_go_cardinality_spark.partitioning import session_fanout

    df = spark.range(1)
    width = spark.sparkContext.defaultParallelism
    assert session_fanout(df, 1) == max(1, width)
    assert session_fanout(df, 10**6) == 10**6


def test_grouped_topk_results_salt_count_independent(spark, sf_dir, monkeypatch):
    """The _grouped_topk exactness proof claims ANY salt count yields
    identical results — pin it by running the retrieval query at a
    degenerate floor (1), the harness floor (32), and a wider-than-
    corpus count (997) and comparing collected rows exactly."""
    from kafka_go_cardinality_spark import partitioning

    results = []
    for salts in (1, 32, 997):
        # patch the derivation itself: the floor-1 case must NOT be
        # rescued by max(floor, defaultParallelism)
        monkeypatch.setattr(
            partitioning, "session_fanout", lambda df, floor: salts
        )
        rows = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in entry_mod.queries()["q_sim_cosine_topk"](
                spark, sf_dir
            ).collect()
        )
        results.append(rows)
    assert results[0] and results[0] == results[1] == results[2]


def test_knn_ivf_covers_every_probe(spark, sf_dir):
    """Output coverage is exact even where prediction quality is
    approximate (r7 advice): the IVF path must emit exactly one row per
    distinct probe id whenever the train side is non-empty — the exact
    twin's coverage — including probes whose probed cells hold zero
    training rows (which vanished before the majority-prior fallback)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_ids = {r["vec_id"] for r in sim.knn_classify(emb).collect()}
    ivf_ids = {r["vec_id"] for r in sim.knn_classify_ivf(emb).collect()}
    assert exact_ids and ivf_ids == exact_ids


def test_knn_ivf_candidate_less_probe_gets_majority_prior(spark):
    """A probe whose n_probe probed cells contain no training rows must
    emit the training-majority label (ties to the smaller label), not
    vanish.  Fixture: two far-apart anchor directions; the lone probe
    (vec_id 0, test_mod 4... every id % 4 == 0 is a probe) sits alone
    on an anchor whose cell holds only probes, with n_probe=1."""
    rows = []
    # train rows clustered on anchor dim 0, labels 1 (x3) and 2 (x2):
    # majority prior = label 1
    for i, lab in ((1, 1), (2, 1), (3, 1), (5, 2), (6, 2)):
        v = [0.0] * 8
        v[0] = 1.0
        v[7] = 0.01 * i
        rows.append((i, v, lab))
    # the probe: alone on the orthogonal anchor, its own cell
    pv = [0.0] * 8
    pv[3] = 1.0
    rows.append((4, pv, 9))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r["vec_id"]: (r["predicted"], r["correct"])
        for r in sim.knn_classify_ivf(
            df, test_mod=4, n_centroids=2, n_probe=1
        ).collect()
    }
    assert 4 in out, "candidate-less probe vanished from the output"
    assert out[4] == (1, 0)


def test_knn_ivf_empty_train_emits_nothing(spark):
    """All-probe corpora (test_mod=1) have an empty train side: both
    twins emit zero rows — the fallback must not invent predictions
    with no model to draw from."""
    rows = [(i, [float(i == j) for j in range(4)], i % 2) for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    assert sim.knn_classify_ivf(df, test_mod=1).count() == 0
    assert sim.knn_classify(df, test_mod=1).count() == 0


def test_knn_ivfpq_agrees_with_exact_on_separable_labels(spark):
    """On label-separable 64-dim data the ADC-prefiltered bulk path
    must predict what the brute-force twin predicts, and both must be
    right — the code budget trivially resolves anchor-separated
    clusters, so any disagreement is a plumbing bug (wrong LUT cell,
    residual/codebook mismatch), not an approximation."""
    rows = []
    for i in range(60):
        lab = i % 3
        v = [0.0] * 64
        v[lab] = 1.0
        v[3 + (i % 57)] = 0.05 + (i % 7) * 0.01
        rows.append((i, v, lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    exact = {
        r["vec_id"]: (r["predicted"], r["correct"])
        for r in sim.knn_classify(df, test_mod=5).collect()
    }
    bulk = {
        r["vec_id"]: (r["predicted"], r["correct"])
        for r in sim.knn_classify_ivfpq(
            df, test_mod=5, n_centroids=3, n_probe=2
        ).collect()
    }
    assert len(bulk) == 12
    assert bulk == exact
    assert all(c == 1 for _, c in bulk.values())


def test_knn_ivfpq_covers_every_probe(spark, sf_dir):
    """Coverage contract inherited from knn_classify_ivf: every probe
    emits exactly one row when the train side is non-empty."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_ids = {r["vec_id"] for r in sim.knn_classify(emb).collect()}
    bulk_ids = {r["vec_id"] for r in sim.knn_classify_ivfpq(emb).collect()}
    assert exact_ids and bulk_ids == exact_ids


def test_knn_ivfpq_prediction_quality_tracks_knn_ivf(spark, sf_dir):
    """The ADC prefilter must not degrade labeling far below the plain
    IVF bulk path on the worst-case fixture: with the r12 scale-aware
    dials (np=20 of the 32-cell floor grid, m=ceil(100·20/16)=125)
    measured 0.80 exact-twin agreement vs knn_ivf's 1.00 (r11
    constants np=16/M=100 measured 0.70 vs 0.80; the probe scaling
    alone diluted the fixed window to 0.60, which is what the
    _scaled_adc_overfetch law exists to restore — selection evidence:
    0.60 at m=100, 0.80 at 125/150, 1.00 at ≥175).  Pin within 20
    points of knn_ivf."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r["vec_id"]: r["predicted"] for r in sim.knn_classify(emb).collect()
    }

    def agreement(df):
        got = {r["vec_id"]: r["predicted"] for r in df.collect()}
        return sum(1 for k, v in got.items() if exact.get(k) == v) / len(got)

    a_ivf = agreement(sim.knn_classify_ivf(emb))
    a_pq = agreement(sim.knn_classify_ivfpq(emb))
    assert a_pq >= a_ivf - 0.2, (a_ivf, a_pq)
    # ABSOLUTE floor (r9 verdict item 7): the M-sensitivity is steep
    # (0.70 at M=100, 0.40 at M=25/50 on this fixture) and the relative
    # pin above would ride knn_ivf down — a future KNN_ADC_OVERFETCH
    # tweak that lands below the usable window must fail HERE.
    assert a_pq >= 0.6, a_pq


def test_knn_ivfpq_empty_corpus_and_empty_train(spark):
    emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int"
    )
    assert sim.knn_classify_ivfpq(emb).count() == 0
    rows = [(i, [float(i == j) for j in range(64)], i % 2) for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    assert sim.knn_classify_ivfpq(df, test_mod=1).count() == 0


def test_knn_ivf_retrieval_recall_floor_at_32x(spark):
    """R8 verdict item 2 + r10 verdict item 1: knn_ivf RETRIEVAL
    quality at the 32×-vectors probe scale, exact twin as ground truth.

    Two contracts, one per grid mode:

    - EXPLICIT fixed grid (n_centroids=32 — the r8 constant-selection
      evidence): candidate fraction 0.5, measured mean recall@5 0.85
      on this worst-case near-orthogonal fixture; floor stays 0.8.
      This dial remains available to callers who need the worst-case
      floor at a known scale.
    - SCALED default (n_cells = isqrt(16000) = 126, n_probe =
      4·isqrt(126) = 44 — r11 verdict item 4: n_probe grows ~√n_cells
      so the probed fraction no longer collapses as 1/√N): worst-case
      mean recall@5 measured 0.795 (was 0.49 at the fixed 16 probes)
      at probed fraction 44/126 ≈ 0.35.  Floor 0.7 — the verdict's
      'Done' gate — plus the centroid-targeting lift pin (recall must
      beat blind probing of the same fraction by ≥1.5×).
      Clusterable-corpus quality under the scaled grid is pinned
      separately (test_knn_ivf_scaled_grid_recall_on_clustered_corpus)."""
    import collections

    from scripts_scale_probe import build_scaled_vectors_dir

    d = build_scaled_vectors_dir(32, "/root/testdata/sf0.001")
    emb = load_table(spark, d, "embeddings")

    def ranked_sets(df):
        s = collections.defaultdict(set)
        for r in df.collect():
            s[r["query_id"]].add(r["neighbor_id"])
        return s

    exact = ranked_sets(sim.knn_ranked(emb))
    fixed = ranked_sets(sim.knn_ivf_ranked(emb, n_centroids=32))

    def mean_recall(ivf):
        rs = [len(ivf.get(q, set()) & ns) / len(ns) for q, ns in exact.items()]
        return sum(rs) / len(rs)

    assert exact and mean_recall(fixed) >= 0.8
    n_cells = sim._scaled_cells(emb.count())
    assert n_cells == 126
    assert sim._scaled_probes(0, n_cells) == 44
    scaled = ranked_sets(sim.knn_ivf_ranked(emb))
    rec = mean_recall(scaled)
    assert rec >= 0.7, rec
    blind = sim._scaled_probes(0, n_cells) / n_cells
    assert rec >= 1.5 * blind, (rec, blind)


def test_knn_ivf_scaled_grid_recall_on_clustered_corpus(spark):
    """The scaled grid's quality contract where it is actually claimed:
    corpora WITH cluster structure (every real embedding space).  500
    deterministic anchor directions × 16 members each (8000 rows →
    isqrt grid = 89 > the 32 floor, Arrow assignment path), jitter ≪
    separation so each probe's exact top-5 lives in its own cluster;
    cell-targeting must recover it at the shrunken probed fraction
    (16/89 ≈ 0.18).  Floor 0.9 (measured ~1.0): if the scaled default
    ever stops routing near-identical vectors to probed cells, this
    fails while the near-orthogonal lift pin above stays green."""
    import collections

    rows = []
    for i in range(8000):
        cluster = i // 16
        v = [0.0] * 64
        # anchor: two deterministic coordinates per cluster
        v[cluster % 64] += 1.0
        v[(cluster * 7 + 3) % 64] += 0.5
        # member jitter: small, deterministic, member-unique
        v[(i * 13 + 5) % 64] += 0.01 + (i % 16) * 0.001
        rows.append((i, v, cluster % 5))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    assert sim._scaled_cells(8000) == 89

    def ranked_sets(df):
        s = collections.defaultdict(set)
        for r in df.collect():
            s[r["query_id"]].add(r["neighbor_id"])
        return s

    exact = ranked_sets(sim.knn_ranked(emb))
    scaled = ranked_sets(sim.knn_ivf_ranked(emb))
    recalls = [
        len(scaled.get(q, set()) & ns) / len(ns) for q, ns in exact.items()
    ]
    assert exact and sum(recalls) / len(recalls) >= 0.9


def test_ivfpq_finds_planted_neighbors(spark, sf_dir):
    """The composed IVF+PQ path must retrieve genuinely-near planted
    twins (cos ≈ 0.99): a near-identical vector lands in the probed
    cells AND its quantized codes give a near-minimal ADC estimate."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = sim.with_planted_neighbors(emb).select("vec_id", "embedding")
    res = sim.ivfpq_topk(corpus, n_queries=56, k=5)
    got = {(r.query_id, r.vec_id) for r in res.collect()}
    planted = [i for i in range(56) if i % 11 == 0]
    assert all((q, q + 1_000_000) in got for q in planted)


def test_ivfpq_consistent_with_pq_on_shared_pairs(spark, sf_dir):
    """IVF+PQ shares pq_topk's codebooks (same deterministic sample),
    so any (query, vec) pair both indexes select must carry the
    bit-identical est_dist — the composition changes WHICH pairs are
    scored, never WHAT a scored pair costs.  Also a coverage floor:
    probing 4/16 cells still overlaps the unconstrained PQ top-k
    meaningfully (measured 40/50 on this fixture)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pq = {
        (r.query_id, r.vec_id): r.est_dist for r in sim.pq_topk(emb).collect()
    }
    ivfpq = {
        (r.query_id, r.vec_id): r.est_dist
        for r in sim.ivfpq_topk(emb).collect()
    }
    shared = set(pq) & set(ivfpq)
    assert len(shared) / len(pq) >= 0.5
    assert all(pq[p] == ivfpq[p] for p in shared)


def test_ivfpq_selected_neighbors_beat_average(spark, sf_dir):
    """Same ranking-quality floor as the PQ test (exact ≈ 0.68, PQ
    0.71-0.86, random 1.0): the cell restriction must not degrade the
    picks to random draws.  Measured mean 0.755 on this fixture; floor
    at 0.85 mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    picks: dict[int, list[int]] = {}
    for r in sim.ivfpq_topk(emb).collect():
        picks.setdefault(r.query_id, []).append(r.vec_id)

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assert len(picks) == 10
    ratios = []
    for q, chosen in picks.items():
        pv = vecs[q]
        dists = {vid: l2sq(pv, v) for vid, v in vecs.items() if vid != q}
        ratios.append(
            (sum(dists[v] for v in chosen) / len(chosen))
            / (sum(dists.values()) / len(dists))
        )
    assert sum(ratios) / len(ratios) < 0.85, ratios


def test_ivfpq_empty_corpus_typed_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int"
    )
    out = sim.ivfpq_topk(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "vec_id", "est_dist",
    ]


def test_ivfpq_residual_finds_planted_neighbors(spark, sf_dir):
    """The residual variant must retrieve every planted twin, like the
    non-residual composition — a regression canary for the codebook
    collapse the distinct-init rule fixed (first-16-rows init made the
    residual sample's head — the seeds' exactly-zero residuals — the
    entire init, and query 22's twin fell from rank 1 to rank 19)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = sim.with_planted_neighbors(emb).select("vec_id", "embedding")
    res = sim.ivfpq_residual_topk(corpus, n_queries=56, k=5)
    got = {(r.query_id, r.vec_id) for r in res.collect()}
    planted = [i for i in range(56) if i % 11 == 0]
    assert all((q, q + 1_000_000) in got for q in planted)


def test_ivfpq_residual_selected_neighbors_beat_average(spark, sf_dir):
    """Same ranking-quality floor as the PQ/IVFPQ tests; measured mean
    0.747 on this fixture — the best of the three PQ variants, as
    residual coding should be."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    picks: dict[int, list[int]] = {}
    for r in sim.ivfpq_residual_topk(emb).collect():
        picks.setdefault(r.query_id, []).append(r.vec_id)

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assert len(picks) == 10
    ratios = []
    for q, chosen in picks.items():
        pv = vecs[q]
        dists = {vid: l2sq(pv, v) for vid, v in vecs.items() if vid != q}
        ratios.append(
            (sum(dists[v] for v in chosen) / len(chosen))
            / (sum(dists.values()) / len(dists))
        )
    assert sum(ratios) / len(ratios) < 0.85, ratios


def test_ivfpq_residual_empty_corpus_typed_empty(spark):
    emb = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int"
    )
    out = sim.ivfpq_residual_topk(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "vec_id", "est_dist",
    ]


def test_ivfpq_residual_beats_raw_adc_when_cells_exceed_code_capacity(spark):
    """THE reason residual encoding exists (Jégou et al. §IV.B): when
    the coarse grid is finer than what 16 codewords per subspace can
    re-describe, raw codes must spend their whole budget on cell
    identity while residual codes spend it on within-cell structure.
    Fixture: 48 random centers (48 modes per subspace > 16 codewords)
    + small within-cluster noise.  Measured mean relative ADC error on
    the IDENTICAL candidate pair set (cells are shared, so both
    variants score exactly the same pairs): raw 7.68 vs residual 0.45
    on same-cluster pairs — pin residual ≤ raw/5 and residual ≤ 0.8
    absolute.  (On near-orthogonal random corpora the inequality
    flips — subtracting a far centroid ADDS variance — which is why
    the operator keeps both variants; see the ivfpq_topk docstring.)"""
    import random

    rng = random.Random(13)
    NC = 48
    centers = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(NC)]

    def member(c):
        return [centers[c][d] + rng.uniform(-0.1, 0.1) for d in range(64)]

    rows = [(i, member(i), i) for i in range(NC)]
    rows += [(i, member(i % NC), i % NC) for i in range(NC, NC + 240)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    vecs = {r[0]: r[1] for r in rows}
    Q = 1_000_000

    def true_q(a, b):
        return sum((round(x * Q) - round(y * Q)) ** 2 for x, y in zip(a, b))

    ests = {}
    for name, fn in (("raw", sim.ivfpq_topk), ("res", sim.ivfpq_residual_topk)):
        ests[name] = {
            (r.query_id, r.vec_id): r.est_dist
            for r in fn(
                emb, n_queries=10, k=500, n_centroids=NC, n_probe=4
            ).collect()
        }
    shared = set(ests["raw"]) & set(ests["res"])
    same = [p for p in shared if p[0] % NC == p[1] % NC]
    assert len(same) >= 20

    def mean_rel_err(name):
        errs = [
            abs(ests[name][p] - true_q(vecs[p[0]], vecs[p[1]]))
            / max(true_q(vecs[p[0]], vecs[p[1]]), 1)
            for p in same
        ]
        return sum(errs) / len(errs)

    raw_err, res_err = mean_rel_err("raw"), mean_rel_err("res")
    assert res_err <= raw_err / 5, (raw_err, res_err)
    assert res_err <= 0.8, res_err


def test_ivfpqr_rerank_recall_floor(spark, sf_dir):
    """The two-stage IVFPQR search must recover near-exact retrieval
    from lossy codes: recall@5 vs exact squared-L2 measured 0.94 on
    this fixture (ADC alone: 0.30).  Floor at 0.8 — below it the
    re-rank window is no longer catching the true neighbors the ADC
    ordering should put there."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def exact_top5(q):
        pv = vecs[q]
        ds = sorted(
            (l2sq(pv, v), vid) for vid, v in vecs.items() if vid != q
        )
        return {vid for _, vid in ds[:5]}

    picks: dict[int, set] = {}
    for r in sim.ivfpq_residual_rerank_topk(emb).collect():
        picks.setdefault(r.query_id, set()).add(r.vec_id)
    assert len(picks) == 10
    recalls = [len(ch & exact_top5(q)) / 5 for q, ch in picks.items()]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivfpqr_finds_planted_neighbors_at_rank_one(spark, sf_dir):
    """Exact re-rank must place every planted twin at RANK 1 (smallest
    exact distance, ~0.25² in double space) — a stronger contract than
    the ADC stages' membership-in-top-5."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = sim.with_planted_neighbors(emb).select("vec_id", "embedding")
    res = sim.ivfpq_residual_rerank_topk(corpus, n_queries=56, k=5)
    best: dict[int, tuple] = {}
    for r in res.collect():
        cur = best.get(r.query_id)
        if cur is None or (r.dist, r.vec_id) < cur:
            best[r.query_id] = (r.dist, r.vec_id)
    for q in (i for i in range(56) if i % 11 == 0):
        assert best[q][1] == q + 1_000_000, (q, best.get(q))


def test_pq_family_recall_floors_vs_exact_l2(spark, sf_dir):
    """R8 verdict item 6: retrieval recall@5 of the PQ family against
    the EXACT squared-L2 top-5 (the metric PQ estimates), not just
    internal consistency.  Measured on this near-orthogonal fixture
    (the worst case for a 128-bit code — random blind draw would be
    5/499 ≈ 0.01): pq 0.22, ivfpq 0.30, ivfpq_residual 0.30.  Floors
    at half the measured values to absorb fixture drift without
    masking a collapse toward random ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }

    def l2sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def exact_top5(q):
        pv = vecs[q]
        ds = sorted(
            (l2sq(pv, v), vid) for vid, v in vecs.items() if vid != q
        )
        return {vid for _, vid in ds[:5]}

    floors = {"pq": 0.11, "ivfpq": 0.15, "ivfpq_residual": 0.15}
    fns = {
        "pq": sim.pq_topk,
        "ivfpq": sim.ivfpq_topk,
        "ivfpq_residual": sim.ivfpq_residual_topk,
    }
    for name, fn in fns.items():
        picks: dict[int, set] = {}
        for r in fn(emb).collect():
            picks.setdefault(r.query_id, set()).add(r.vec_id)
        recalls = [
            len(chosen & exact_top5(q)) / 5 for q, chosen in picks.items()
        ]
        mean = sum(recalls) / len(recalls)
        assert mean >= floors[name], (name, mean)


def test_standardize_moments_and_degenerate_dim(spark):
    """Standardized coordinates must have per-dimension mean ~0 and
    variance ~1 (within micro-unit rounding), a constant dimension maps
    to exactly 0 everywhere, and wrong-dimension vectors are excluded
    by the 64-dim contract."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        v[5] = 0.25            # constant dim -> zero variance
        rows.append((i, v, 0))
    rows.append((999, [0.5] * 32, 1))  # wrong dim -> dropped
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r for r in sim.standardize(emb).collect()}
    assert 999 not in out and len(out) == 40
    zs = [[int(t) / 1e6 for t in out[i]["z_csv"].split(",")] for i in range(40)]
    n = len(zs)
    for d in range(64):
        col = [z[d] for z in zs]
        mean = sum(col) / n
        var = sum(c * c for c in col) / n - mean * mean
        if d == 5:
            assert col == [0.0] * n
        else:
            assert abs(mean) < 1e-4, (d, mean)
            assert abs(var - 1.0) < 1e-3, (d, var)
    for i in range(40):
        assert out[i]["z_sq_norm"] == sum(
            int(t) ** 2 for t in out[i]["z_csv"].split(",")
        )


def test_winsorize_clips_to_exact_percentiles(spark):
    """Per-dim bounds must equal the naive exact order statistics
    (k = ceil(p*n/100), values at rank k ascending) and a planted
    outlier coordinate must clip to the P95 bound while interior
    coordinates pass through unchanged."""
    import math
    import random

    rng = random.Random(11)
    rows = []
    for i in range(50):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v, 0))
    rows[7] = (7, [100.0] + rows[7][1][1:], 0)  # dim-0 outlier
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r for r in sim.winsorize(emb).collect()}
    q0 = sorted(
        math.floor(r[1][0] * 1e6 + 0.5) for r in rows
    )
    n = len(rows)
    lo = q0[max(1, math.ceil(0.05 * n)) - 1]
    hi = q0[max(1, math.ceil(0.95 * n)) - 1]
    got7 = [int(t) for t in out[7]["w_csv"].split(",")]
    assert got7[0] == hi  # outlier clipped to the exact P95
    assert out[7]["n_clipped"] >= 1
    # a vector whose dim-0 lies strictly inside (lo, hi) is untouched there
    for i in range(50):
        q = math.floor(rows[i][1][0] * 1e6 + 0.5)
        if lo < q < hi:
            assert [int(t) for t in out[i]["w_csv"].split(",")][0] == q


def test_mmr_matches_python_model_and_diversifies(spark):
    """The selection sequence must equal an independent Python MMR over
    the same vectors, and a near-duplicate of the best hit — which
    plain top-k would take second — must rank behind a diverse pick."""
    import math
    import random

    rng = random.Random(3)

    def rand_vec():
        return [rng.uniform(-1, 1) for _ in range(64)]

    best = rand_vec()
    near = [x + 0.001 for x in best]          # near-dup of the best hit
    rows = [(0, rand_vec(), 0), (1, best, 0), (2, near, 0)]
    rows += [(i, rand_vec(), 0) for i in range(3, 20)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = [
        (r["sel_rank"], r["vec_id"])
        for r in sim.mmr_select(emb).orderBy("sel_rank").collect()
    ]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na > 0 and nb > 0 else 0.0

    vecs = {i: v for i, v, _ in rows}
    q = vecs.pop(0)  # min-id vector is the query
    rel = {i: cos(v, q) for i, v in vecs.items()}
    ms = {i: 0.0 for i in vecs}
    want = []
    for rank in range(1, sim.MMR_K + 1):
        if not vecs:
            break
        pick = max(vecs, key=lambda i: (0.7 * rel[i] - 0.3 * ms[i], -i))
        want.append((rank, pick))
        pv = vecs.pop(pick)
        ms.pop(pick)
        for i, v in vecs.items():
            ms[i] = max(ms[i], cos(v, pv))
    assert got == want
    # top-2 by plain relevance are the near-dup pair; MMR must not take
    # both in its first two picks
    top2 = sorted(rel, key=lambda i: -rel[i])[:2]
    if set(top2) == {1, 2}:
        assert {got[0][1], got[1][1]} != {1, 2}


def test_scaled_overfetch_formula():
    """The scale-aware re-rank window (r9 verdict item 2): exact
    integer values the oracle's scalar-subquery SQL must reproduce —
    the 500-row fixture lands exactly on the measured-good floor 50
    (no behavior change at fixture/parity scale) and the window grows
    linearly after (32x fixture -> 1600)."""
    f = sim._scaled_overfetch
    assert f(500, 16, 4) == 50          # fixture: floor binds exactly
    assert f(0, 16, 4) == 50            # empty corpus: floor
    assert f(16_000, 16, 4) == 1_600    # 32x: ~40% of the probed pool
    assert f(4_000, 16, 4) == 400
    assert f(501, 16, 4) == 51          # ceil, not floor


def test_scaled_overfetch_oracle_equality_at_hostile_sizes():
    """R10 verdict item 7: the engine's Python ceil-division and the
    oracle's SQL integer expression must agree at EVERY N — swept with
    Hypothesis around the floor boundary (M transitions 50→51 at
    N=1563 for the shipped 16-centroid/4-probe dial) and at primes,
    so the two integer derivations can never drift."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from kafka_go_cardinality_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        PQ_RERANK_OVERFETCH,
        PQ_RERANK_POOL_DEN,
        PQ_RERANK_POOL_NUM,
        _scaled_overfetch,
    )

    con = duckdb.connect()
    num_mult = IVF_PROBES * PQ_RERANK_POOL_NUM
    den = PQ_RERANK_POOL_DEN * IVF_CENTROIDS

    def oracle_m(n: int) -> int:
        # the exact integer expression ivfpq_residual_rerank_oracle_sql
        # emits, with the scalar-subquery count bound to a literal
        return con.execute(
            f"SELECT greatest({PQ_RERANK_OVERFETCH}, "
            f"({n} * {num_mult} + {den - 1}) // {den})"
        ).fetchone()[0]

    # floor boundary: M leaves the 50 floor exactly where ceil says
    boundary = (PQ_RERANK_OVERFETCH * den) // num_mult
    for n in range(max(0, boundary - 3), boundary + 4):
        assert _scaled_overfetch(n, IVF_CENTROIDS, IVF_PROBES) == oracle_m(n)
    for n in (2, 3, 5, 1009, 1559, 1567, 99991):  # primes straddling it
        assert _scaled_overfetch(n, IVF_CENTROIDS, IVF_PROBES) == oracle_m(n)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000_000))
    def sweep(n):
        assert _scaled_overfetch(n, IVF_CENTROIDS, IVF_PROBES) == oracle_m(n)

    sweep()
    con.close()


def test_scaled_cells_formula_and_oracle_equality():
    """R10 verdict item 1's derivation contract: n_cells =
    max(KNN_IVF_CENTROIDS, isqrt(N)) — exact integer sqrt on BOTH
    sides.  Python uses math.isqrt; the oracle corrects a float
    floor(sqrt()) by ±1 (_isqrt_sql), which this test holds to
    math.isqrt at the hostile spots (k², k²±1 — where a bare float
    floor is wrong) and under a Hypothesis sweep."""
    import math

    import duckdb
    from hypothesis import given, settings, strategies as st

    f = sim._scaled_cells
    assert f(0) == 32 and f(500) == 32          # fixtures: floor binds
    assert f(1024) == 32 and f(1025) == 32      # isqrt == 32 boundary
    assert f(1089) == 33                        # first above the floor
    assert f(2000) == 44                        # sf0.1 bench corpus
    assert f(16_000) == 126 and f(64_000) == 252  # 32x / 128x probes

    con = duckdb.connect()

    def oracle_cells(n: int) -> int:
        return con.execute(
            f"SELECT {sim.scaled_cells_sql(f'SELECT {n}')}"
        ).fetchone()[0]

    hostile = []
    for k in (32, 33, 100, 1000, 44721, 2**26 - 1):
        hostile += [k * k - 1, k * k, k * k + 1]
    for n in hostile + [0, 1, 2, 500, 2000, 99991, 1_000_003]:
        assert oracle_cells(n) == f(n), n

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=10**12))
    def sweep(n):
        assert oracle_cells(n) == max(32, math.isqrt(n)) == f(n)

    sweep()
    con.close()


def test_knn_scaled_grid_oracle_parity_above_floor(spark):
    """The real guard on r10 verdict item 1: ENGINE and ORACLE must
    derive the same grid above the floor.  At 8× the fixture (4000
    rows → isqrt 63 > 32, HOF assignment) and 16× (8000 → 89 ≥ the
    64-cell Arrow-assignment threshold) both bulk-kNN queries must
    hash-match their registered DuckDB oracles — covering the scaled
    branch on BOTH assignment paths, which parity at sf0.01 (floor
    binds) never exercises."""
    import shutil

    import duckdb

    from kafka_go_cardinality_spark.queries import ORACLE_SQL, QUERIES
    from scripts_scale_probe import build_scaled_vectors_dir
    from tests.conftest import assert_frames_match

    for factor, cells in ((8, 63), (16, 89)):
        d = build_scaled_vectors_dir(factor, "/root/testdata/sf0.001")
        try:
            assert sim._scaled_cells(500 * factor) == cells
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')"
            )
            for name in ("q_sim_knn_ivf", "q_sim_knn_ivfpq"):
                spark_pdf = QUERIES[name](spark, d).toPandas()
                oracle_pdf = con.execute(ORACLE_SQL[name]).fetchdf()
                assert_frames_match(spark_pdf, oracle_pdf)
            con.close()
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_arrow_assignment_bit_equals_hof(spark, sf_dir):
    """The two _centroid_scored_cells branches (interpreted HOF fold
    below ARROW_ASSIGN_MIN_CELLS, Arrow-batched sequential fold at or
    above it) must produce IDENTICAL doubles — same IEEE adds in the
    same order — including the ragged-row collapse (a vector whose
    length differs from the centroid dim gets an all-null cosine
    array on both paths, the zip_with null-padding contract)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").filter(
        sim.vec_finite(F.col("embedding"))
    )
    ragged = spark.createDataFrame(
        [(999_999, [0.5] * 32, 1)],
        "vec_id long, embedding array<double>, label int",
    )
    emb = emb.unionByName(ragged.select("vec_id", "embedding", "label"))

    sc_a, seeds = sim._centroid_scored_cells(emb, 80)
    assert len(seeds) >= sim.ARROW_ASSIGN_MIN_CELLS
    rows_a = {r["vec_id"]: list(r["ca"]) for r in sc_a.collect()}
    sc_a.unpersist()
    old = sim.ARROW_ASSIGN_MIN_CELLS
    sim.ARROW_ASSIGN_MIN_CELLS = 10**9
    try:
        sc_h, _ = sim._centroid_scored_cells(emb, 80)
        rows_h = {r["vec_id"]: list(r["ca"]) for r in sc_h.collect()}
        sc_h.unpersist()
    finally:
        sim.ARROW_ASSIGN_MIN_CELLS = old

    assert rows_a.keys() == rows_h.keys()
    for k in rows_a:
        a, h = rows_a[k], rows_h[k]
        assert len(a) == len(h) == 80
        for x, y in zip(a, h):
            assert (x is None) == (y is None) and (x is None or x == y), k
    assert rows_a[999_999] == [None] * 80


def test_ivfpqr_recall_holds_under_corpus_growth(spark, tmp_path):
    """The quality-at-scale pin for the scale-aware M (r9 verdict item
    2): at 8x the fixture corpus (4000 rotated-copy vectors, the scale
    probe's growth model) recall@5 vs exact squared-L2 must hold >= 0.8
    -- with M frozen at 50 it measures 0.42 here and 0.24 at 32x, while
    the scaled window clears the floor here and measured 1.0 at 32x
    (scripts_scale_probe --vectors --recall)."""
    from scripts_scale_probe import build_scaled_vectors_dir
    from tests.conftest import SF_DIR

    d = build_scaled_vectors_dir(8, SF_DIR)
    try:
        emb = load_table(spark, d, "embeddings")
        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()
            if r["embedding"] is not None and len(r["embedding"]) == 64
        }

        def l2sq(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        def exact_top5(q):
            pv = vecs[q]
            ds = sorted(
                (l2sq(pv, v), vid) for vid, v in vecs.items() if vid != q
            )
            return {vid for _, vid in ds[:5]}

        picks: dict[int, set] = {}
        for r in sim.ivfpq_residual_rerank_topk(emb).collect():
            picks.setdefault(r.query_id, set()).add(r.vec_id)
        assert len(picks) == 10
        recalls = [len(ch & exact_top5(q)) / 5 for q, ch in picks.items()]
        assert sum(recalls) / len(recalls) >= 0.8, recalls
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_dmodel_round_trips_non_finite_values(spark):
    """R10 ADVICE (low): json.dumps emits non-standard Infinity/NaN
    tokens, so _dmodel/_dot_sql pin allowNonNumericNumbers ON instead
    of riding Spark's default — a default flip would degrade the parse
    to a silent NULL array under PERMISSIVE from_json.  Reachable case:
    a centroid norm overflowing to +inf from large finite elements.
    Pins: the folded literal round-trips ±inf and NaN as VALUES (never
    null), and _dot_sql's generated SQL parses them identically."""
    import math

    from pyspark.sql import functions as F

    vals = [1.5, float("inf"), float("-inf"), float("nan"), 1e308]
    row = (
        spark.range(1)
        .select(sim._dmodel(vals, "array<double>").alias("m"))
        .collect()[0]
    )
    got = list(row["m"])
    assert got[0] == 1.5 and got[4] == 1e308
    assert got[1] == float("inf") and got[2] == float("-inf")
    assert got[3] is not None and math.isnan(got[3])
    # _dot_sql: dot([1,0,...], consts-with-inf) folds to inf, not null
    dot_row = (
        spark.range(1)
        .select(
            F.expr(
                sim._dot_sql("array(1.0d, 1.0d)", [float("inf"), 0.0])
            ).alias("d")
        )
        .collect()[0]
    )
    assert dot_row["d"] == float("inf")


def test_scaled_dedup_dials_match_oracle_sql():
    """The three r12 scale dials — semdedup cells, embedding-neardup
    sub-cells, knn scaled probes — must emit the SAME integer from the
    engine formula and the oracle SQL at every N, swept across floor /
    activation boundaries, perfect squares ±1 and primes (the exact
    device of the band-width ladder test)."""
    import duckdb

    con = duckdb.connect()
    probe_ns = [0, 1, 15, 16, 255, 256, 257, 499, 500, 2000, 2024, 2025,
                4095, 4096, 4097, 4224, 4225, 4226, 8000, 99991, 10**6,
                10**9, 10**12]
    sem_sql = sim.semdedup_cells_sql("SELECT {n} AS n")
    sub_sql = sim.emb_neardup_subcells_sql("SELECT {n} AS n")
    prm_sql = sim.scaled_params_ctes("SELECT {n} AS n")
    for n in probe_ns:
        got = con.execute(f"SELECT {sem_sql.format(n=n)}").fetchone()[0]
        assert got == sim._semdedup_cells(n), ("sem", n)
        got = con.execute(f"SELECT {sub_sql.format(n=n)}").fetchone()[0]
        assert got == sim._emb_neardup_subcells(n), ("sub", n)
        got = con.execute(
            f"WITH {prm_sql.format(n=n)} "
            "SELECT (SELECT nc FROM ncs), (SELECT np FROM nps), "
            "(SELECT m FROM mfs)"
        ).fetchone()
        assert got[0] == sim._scaled_cells(n), ("nc", n)
        assert got[1] == sim._scaled_probes(n), ("np", n)
        assert got[2] == sim._scaled_adc_overfetch(sim._scaled_probes(n)), (
            "m", n,
        )
    con.close()
    # shipped-fixture dials: sub-blocking OFF at every fixture; the knn
    # probe rule gives 20 of the 32-cell floor grid at 500 rows (a
    # deeper probe than the old constant 16 — oracled, not byte-stable)
    assert sim._emb_neardup_subcells(500) == 1
    assert sim._emb_neardup_subcells(2000) == 1
    assert sim._scaled_probes(500) == 20
    assert sim._scaled_probes(2000) == 24
    assert sim._semdedup_cells(256) == sim.SEMDEDUP_CELLS


def test_scaled_dedup_parity_and_planted_recall_above_floor(
    spark, tmp_path_factory
):
    """R11 verdict items 1+2, the 'Done' gates: at a 16× corpus (8000
    rows — semdedup grid 89 ≥ the 64-cell Arrow threshold, embedding
    sub-blocking ACTIVE at 89 cells) both dedup queries must still
    hash-match their oracles (engine and oracle derive the same grid
    from the same raw count), and the planted twins must stay caught:
    ≥95% of (orig, orig+1M) pairs flagged by the sub-blocked
    embedding-neardup (its contract is exact recall within blocks —
    the top-3 neighbor-cell expansion is what buys this), ≥60% of
    planted copies dropped by semantic dedup (the documented SemDeDup
    single-cell escape, measured 0.65-0.74 across grids)."""
    import duckdb

    from kafka_go_cardinality_spark.queries import ORACLE_SQL, QUERIES
    from scripts_scale_probe import build_scaled_vectors_dir
    from tests.conftest import assert_frames_match

    import shutil

    d = build_scaled_vectors_dir(16, "/root/testdata/sf0.001")
    try:
        assert sim._semdedup_cells(8000) == 89
        assert sim._emb_neardup_subcells(8000) == 89
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        emb_pdf = QUERIES["q_dedup_embedding"](spark, d).toPandas()
        want = con.execute(ORACLE_SQL["q_dedup_embedding"]).fetchdf()
        assert_frames_match(emb_pdf, want)
        sem_pdf = QUERIES["q_dedup_semantic"](spark, d).toPandas()
        want = con.execute(ORACLE_SQL["q_dedup_semantic"]).fetchdf()
        assert_frames_match(sem_pdf, want)
        planted = {
            int(r[0])
            for r in con.execute(
                """SELECT vec_id FROM embeddings
                   WHERE vec_id % 11 = 0 AND len(embedding) = 64"""
            ).fetchall()
        }
        con.close()
        assert planted
        pairs = {
            (int(r.vec_a), int(r.vec_b)) for r in emb_pdf.itertuples()
        }
        caught = {v for v in planted if (v, v + 1_000_000) in pairs}
        assert len(caught) >= 0.95 * len(planted), (
            len(caught), len(planted)
        )
        kept = {
            int(r.vec_id) for r in sem_pdf.itertuples() if r.is_kept
        }
        dropped = {v for v in planted if (v + 1_000_000) not in kept}
        assert len(dropped) >= 0.6 * len(planted), (
            len(dropped), len(planted)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_block_pair_pass_bit_identical_to_join_form(spark):
    """R12 optimization pin: above the Arrow gate, the grouped-map
    block-pair pass (udfs.block_pair_cos + udfs.topk_cells_udf) must be
    BIT-IDENTICAL to the equi-self-join + interpreted-HOF form it
    replaced — same pairs, same raw doubles, same tie rule on the
    top-3 cell selection.  Replicates the old join form inline at a
    forced 89-cell grid over the 16× corpus and demands frame equality
    for both embedding_neardup_pairs and semantic_dedup."""
    import shutil

    from pyspark.sql import functions as F

    from kafka_go_cardinality_spark.functions import cosine_pre, dot
    from scripts_scale_probe import build_scaled_vectors_dir

    d = build_scaled_vectors_dir(16, "/root/testdata/sf0.001")
    try:
        emb = load_table(spark, d, "embeddings")
        n_cells = 89

        # --- embedding_neardup_pairs: new grouped path (public API).
        got = {
            (int(r.vec_a), int(r.vec_b), int(r.label), float(r.cos))
            for r in sim.embedding_neardup_pairs(emb, n_cells=n_cells)
            .collect()
        }

        # Old join form, replicated verbatim (reversed struct sort for
        # top-3 cells, exploded equi self-join, interpreted HOF fold).
        scored_cells, seeds = sim._centroid_scored_cells(
            sim.with_planted_neighbors(emb), n_cells, keep=("label",)
        )
        assert seeds
        ranked = F.reverse(
            F.array_sort(
                F.transform(
                    F.col("ca"),
                    lambda c, i: F.struct(
                        c.alias("cos"), i.cast("int").alias("cell")
                    ),
                )
            )
        )
        acells = scored_cells.select(
            "vec_id",
            "v",
            "label",
            "nrm",
            F.transform(
                F.slice(ranked, 1, sim.EMB_NEARDUP_PROBE_CELLS),
                lambda s: s["cell"],
            ).alias("cells"),
        )
        a = acells.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            "label",
            F.explode("cells").alias("cell"),
        )
        b = acells.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
            "label",
            F.explode("cells").alias("cell"),
        )
        want = {
            (int(r.vec_a), int(r.vec_b), int(r.label), float(r.cos))
            for r in (
                a.join(b, ["label", "cell"])
                .filter(F.col("vec_a") < F.col("vec_b"))
                .select(
                    "vec_a",
                    "vec_b",
                    "label",
                    F.round(
                        cosine_pre(
                            dot(F.col("va"), F.col("vb")),
                            F.col("na"),
                            F.col("nb"),
                        ),
                        6,
                    ).alias("cos"),
                )
                .filter(F.col("cos") >= 0.95)
                .distinct()
                .collect()
            )
        }
        assert got == want

        # --- semantic_dedup: new grouped path vs old join form.
        got_sem = {
            (int(r.vec_id), int(r.cell), bool(r.is_kept))
            for r in sim.semantic_dedup(emb, n_cells=n_cells).collect()
        }
        with_cell = scored_cells.select(
            "vec_id",
            "v",
            "nrm",
            (F.array_position(F.col("ca"), F.array_max("ca")) - 1)
            .cast("int")
            .alias("cell"),
        )
        a2 = with_cell.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            "cell",
        )
        b2 = with_cell.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("vb"),
            F.col("nrm").alias("nb"),
            "cell",
        )
        removed = (
            a2.join(b2, "cell")
            .filter(F.col("vec_a") < F.col("vec_b"))
            .filter(
                cosine_pre(
                    dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
                )
                >= sim.SEMDEDUP_TAU
            )
            .select("vec_b")
            .distinct()
        )
        want_sem = {
            (int(r.vec_id), int(r.cell), bool(r.is_kept))
            for r in with_cell.join(
                removed, with_cell["vec_id"] == removed["vec_b"], "left"
            )
            .select(
                "vec_id", "cell", F.col("vec_b").isNull().alias("is_kept")
            )
            .collect()
        }
        assert got_sem == want_sem
    finally:
        shutil.rmtree(d, ignore_errors=True)
