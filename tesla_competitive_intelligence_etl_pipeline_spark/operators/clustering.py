"""Distributed k-means (Lloyd) over embedding columns — corpus clustering
for training-data curation (domain balancing, dedup-aware sampling strata,
topic mixture analysis).

Scale design (the iterative-algorithm pattern, like operators/dedup
connected components):

- **Centroids live on the driver** (k x dim floats — a few KB) and enter each
  iteration's plan as literal arrays, so assignment is a pure map-side
  expression: no join, no shuffle to label a vector.
- **The update step shuffles k rows, not the corpus.** Per-cluster vector
  sums use MLlib's ``Summarizer`` typed aggregator — one JVM-side hash
  aggregate with map-side partial combine whose plan is constant-size at
  any embedding width; only (cluster, count, sum-vector) rows cross the
  wire. The posexplode formulation (shuffle n x dim rows) is exactly what
  this avoids.
- **One pass per iteration**, fixed iteration cap + early stop on centroid
  drift; the per-iteration driver collect is k rows (the same sanctioned
  tiny-collect as the IVF centroid table).
- Deterministic: seeds are the k vectors with the smallest stable md5
  bucket of their id (engine-portable, no rand()), ties by id; argmin over
  (distance, cluster) struct breaks distance ties by lowest cluster index.

Driver-memory bound (the 100x operator's arithmetic): centroid state is
k x dim x 8 B held on the driver AND serialized into each iteration's plan
as a literal — k=8/dim=64 is 4 KiB; k=4,096/dim=1,024 is 32 MiB (fine);
k=65,536/dim=4,096 is ~2 GiB and does NOT fit the literal-broadcast
pattern. Escape hatch at that scale — IMPLEMENTED as
``assign_clusters_join`` (r6): centroids as a (cluster, centroid)
DataFrame, broadcast-join + one min/max aggregate per point, no
driver-held state; pinned bit-identical to the literal path (and to
ivf_index_append's cosine argmax) in tests. The literal form stays the
default because typical curation clusterings (k <= a few thousand) sit
far below the bound and it saves a join per iteration.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tesla_competitive_intelligence_etl_pipeline_spark.operators.sampling import stable_bucket


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    with_distance: bool = False,
) -> DataFrame:
    """Label each row with its nearest centroid (map-side; no join). Ties on
    distance go to the lowest cluster index, so assignment is total.
    ``with_distance`` also emits ``sq_dist`` (the distance to the assigned
    centroid) from the SAME argmin expression — consumers that need both
    must not pay the k x dim distance computation twice.

    All k centroids enter the plan as ONE 2-D array literal scanned by a
    single ``transform`` lambda, so the expression tree is constant-size in
    both k and dim. The earlier struct-per-centroid form (k aggregate
    subtrees over k*dim literal nodes) cost ~1.4 s per iteration at
    k=8/dim=64 in analysis + codegen alone; this form measures ~0.5 s/iter
    for the same job."""
    vec = F.col(vec_col).cast("array<double>")
    pairs = F.transform(
        F.lit([[float(v) for v in c] for c in centroids]),
        lambda c, j: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            j.alias("j"),
        ),
    )
    best = F.array_min(pairs)
    out = df.withColumn("cluster", best.getField("j"))
    if with_distance:
        out = out.withColumn("sq_dist", best.getField("d"))
    return out


def centroids_to_df(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    """(cluster, centroid) DataFrame from a Python centroid list — the
    input shape assign_clusters_join consumes (and what a huge-k training
    job would materialize as a table instead of holding driver-side)."""
    return spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )


def assign_clusters_join(
    df: DataFrame,
    vec_col: str,
    centroids_df: DataFrame,
    id_col: str,
    with_distance: bool = False,
    metric: str = "l2",
    cluster_col: str = "cluster",
    centroid_col: str = "centroid",
) -> DataFrame:
    """The documented ESCAPE HATCH for centroid state too big for a plan
    literal (module docstring: k x dim beyond ~10^8 floats — k=65,536 at
    dim 4,096 is ~2 GiB and cannot ride the literal/driver pattern), now
    implemented rather than promised (r6): centroids arrive as a
    (cluster, centroid) DataFrame, each row is scored against ALL centroids
    through a BROADCAST nested-loop join, and one min/max aggregate per row
    picks the assignment — no driver-held centroid state anywhere.

    Cost shape: the broadcast fans each input row out to k scored rows,
    then ONE partial-aggregating groupBy(id) reduces them and a join on
    ``id_col`` carries the label back to the full row — the same
    shuffle-on-key shape as the k-means update step, which is exactly the
    price the literal form exists to avoid at small k. Use the literal
    ``assign_clusters`` below ~10^7-10^8 centroid floats; switch to this
    past it (or when centroids already live in a table).

    ``metric``: 'l2' matches assign_clusters bit-for-bit (same zip_with
    fold, same ties-to-lowest-cluster via min over (dist, cluster));
    'cosine' matches ivf_index_append's argmax (round-9 cosine, max over
    (sim, cell) — its tie rule) so an IVF deployment can swap it in for
    the append's assignment. Equivalence is pinned in tests."""
    vec = F.col(vec_col).cast("array<double>")
    cent = F.col(centroid_col).cast("array<double>")
    if metric == "l2":
        score = F.aggregate(
            F.zip_with(vec, cent, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        best = F.min(F.struct(score.alias("s"), F.col(cluster_col).alias("j")))
    elif metric == "cosine":
        from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import cosine

        score = F.round(cosine(vec, cent), 9)
        best = F.max(F.struct(score.alias("s"), F.col(cluster_col).alias("j")))
    else:
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    scored = (
        df.select(id_col, vec_col)
        .join(F.broadcast(centroids_df.select(cluster_col, centroid_col)))
        .groupBy(id_col)
        .agg(best.alias("__best"))
        .select(
            id_col,
            F.col("__best").getField("j").alias("cluster"),
            F.col("__best").getField("s").alias("__s"),
        )
    )
    out = df.join(scored, id_col)
    if with_distance:
        out = out.withColumn(
            "sq_dist" if metric == "l2" else "cos_sim", F.col("__s")
        )
    return out.drop("__s")


def _cluster_stats(
    assigned: DataFrame, vec_col: str, dim: int
) -> dict[int, tuple[int, list[float]]]:
    """Per-cluster (count, per-dimension sums), collected driver-side
    (k rows x dim values — the sanctioned tiny collect of the update step).

    ONE hash-aggregate job at ANY embedding width: the vector sum uses
    MLlib's ``Summarizer`` typed aggregator (JVM-side, map-side partial
    combine, k rows shuffled), so the plan holds a single aggregate
    expression instead of ``dim`` per-dimension SUMs. The earlier chunked
    per-dimension form (VERDICT r3 item 4) bounded codegen at wide dims but
    still paid ceil(dim/256) jobs; this is dim-independent in both plan size
    and job count — dim 4096 is the same one job as dim 64."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer

    vec = F.col(vec_col).cast("array<double>")
    rows = (
        assigned.select("cluster", array_to_vector(vec).alias("__v"))
        .groupBy("cluster")
        .agg(F.count("*").alias("n"), Summarizer.sum(F.col("__v")).alias("s"))
        .select("cluster", "n", vector_to_array("s").alias("s"))
        .collect()
    )
    return {r["cluster"]: (r["n"], list(r["s"])) for r in rows}


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
    round_decimals: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means. Returns (assignments df with a ``cluster`` column,
    final centroids). ``df`` is scanned once per iteration, so it is
    repartitioned across cores (small single-file inputs otherwise iterate
    on ONE partition) and persisted for the iteration loop; the persist is
    released before returning (the returned assignment plan recomputes from
    the final centroids — no storage leak in long-lived sessions).

    ``round_decimals``: round each updated centroid component (driver-side,
    Python round) to this many decimals per iteration. This makes the final
    centroids ENGINE-PORTABLE: the per-cluster vector sums are double
    aggregates whose partial-merge order varies run-to-run and
    engine-to-engine (last-ulp noise), and rounding quantizes that noise
    away so an independent implementation (the unrolled-Lloyd DuckDB oracle
    in plans/oracle_vec.py) reproduces bit-identical centroids. 1e-6 is far
    above double noise and far below any real centroid separation — it does
    not change clustering quality, it pins reproducibility."""
    from tesla_competitive_intelligence_etl_pipeline_spark.sources.io import spread

    df = spread(df, id_col).persist()
    try:
        # deterministic, engine-portable seeding: k lowest stable-bucket rows
        # (r13, guide §1.2 step 1 — one fewer pass: the former dim-probe
        # `first()` job is folded into this collect; dim comes from seeds)
        seeds = (
            df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(stable_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc())
            .limit(k)
            .collect()
        )
        if not seeds:
            raise ValueError("kmeans: empty input (or empty training sample)")
        dim = len(seeds[0]["v"])
        if len(seeds) < k:
            warnings.warn(
                f"kmeans: k={k} but input has only {len(seeds)} rows; "
                f"proceeding with k={len(seeds)}",
                stacklevel=2,
            )
            k = len(seeds)
        centroids = [list(r["v"]) for r in seeds]

        if round_decimals is not None:
            centroids = [[round(v, round_decimals) for v in c] for c in centroids]
        for _ in range(max_iters):
            assigned = assign_clusters(df, vec_col, centroids)
            stats = _cluster_stats(assigned, vec_col, dim)
            new_centroids = list(centroids)  # empty clusters keep their centroid
            for c, (n, sums) in stats.items():
                new_centroids[c] = [s / n for s in sums]
            if round_decimals is not None:
                new_centroids = [
                    [round(v, round_decimals) for v in c] for c in new_centroids
                ]
            shift = max(
                sum((a - b) * (a - b) for a, b in zip(old, new))
                for old, new in zip(centroids, new_centroids)
            )
            centroids = new_centroids
            if shift < tol:
                break
    finally:
        df.unpersist()
    return assign_clusters(df, vec_col, centroids), centroids


def kmeans_df(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 10,
    tol: float = 1e-6,
    round_decimals: int | None = None,
    reliable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """DataFrame-RESIDENT Lloyd — the huge-k twin of ``kmeans`` (r6): the
    centroid state never touches the driver. Assignment goes through
    assign_clusters_join (broadcast join, no plan literal), the update is a
    groupBy(cluster) Summarizer aggregate whose result STAYS a (cluster,
    centroid) DataFrame, empty clusters keep their centroid via a left
    join + coalesce, and convergence is a 1-row max-shift aggregate. Use
    past the literal form's ~10^8-float centroid bound (module docstring);
    below it, ``kmeans`` saves a join per iteration.

    Switch rule, MEASURED (r7 crossover sweep, SCALING.md): there is no
    performance crossover — the df/literal ratio WIDENS with k (1.55x at
    k=128, 2.07x at k=512, 2.43x at k=1024 on 16x sf0.1) because the join
    fan-out is also O(k) per row while the literal form does the same
    compute shuffle-free inside codegen. The bound is PHYSICAL: pick
    ``kmeans`` whenever k x dim fits the ~10^8-float plan bound, and this
    variant only past it.

    Semantics mirror ``kmeans`` exactly — same stable-md5 seeding order,
    same ties-to-lowest-cluster argmin, same empty-cluster and early-stop
    rules; ``round_decimals`` uses HALF_EVEN (F.bround) where the literal
    form uses Python round() — both HALF_EVEN, but on different operands
    (ADVICE r6): round() acts on the exact binary double, F.bround on the
    shortest decimal repr (Java BigDecimal.valueOf). They agree except when
    a centroid component's shortest repr is an EXACT tie at the target
    scale (e.g. 2.675 at 2 decimals — repr-tie rounds to 2.68, the binary
    value 2.67499...982 to 2.67). A mean of summed doubles landing on a
    shortest-repr tie at 6 decimals is a measure-zero event the pinned-data
    tests would catch deterministically if the fixtures ever produced one;
    on any tie-free input the two variants produce IDENTICAL centroids and
    assignments (pinned in tests). Per-iteration centroid lineage is truncated (localCheckpoint;
    ``reliable=True`` for decommissioning-prone clusters, as in
    operators/dedup). Returns (assignments df, (cluster, centroid) df).

    Precondition: ``id_col`` must be unique — it is the grouping key of
    the per-iteration assignment aggregate (r14) and of
    assign_clusters_join's argmin, exactly as every other consumer of the
    embeddings key assumes. Rows sharing an id would collapse to one
    update contribution (pre-r14 they were re-attached by a join and each
    counted, under a shared label — a differently-arbitrary answer);
    deduplicate upstream if ingestion can produce id collisions."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.ml.stat import Summarizer
    from pyspark.sql import Window

    from tesla_competitive_intelligence_etl_pipeline_spark.operators.dedup import (
        _truncate_lineage,
    )

    def _round(col):
        if round_decimals is None:
            return col
        return F.transform(col, lambda x: F.bround(x, round_decimals))

    from tesla_competitive_intelligence_etl_pipeline_spark.sources.io import spread

    slim = (
        spread(
            df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v")),
            id_col,
        )
        .persist()
    )
    try:
        # same deterministic seeding as kmeans: the k lowest
        # (stable_bucket(id), id) rows, cluster index = seed rank. The
        # k-row window is the one k-sized single-task stage (seeding only).
        # (r13: the former `slim.first()` empty-probe job is folded into the
        # actual_k count below — one fewer pass, guide §1.2 step 1.)
        order = [stable_bucket(F.col(id_col), 1 << 31).asc(), F.col(id_col).asc()]
        w = Window.orderBy(*order)
        cents = _truncate_lineage(
            slim.orderBy(*order)
            .limit(k)
            .select(
                (F.row_number().over(w) - 1).alias("cluster"),
                _round(F.col("__v")).alias("centroid"),
            ),
            reliable,
        )
        actual_k = cents.count()
        if actual_k == 0:
            raise ValueError("kmeans_df: empty input")
        if actual_k < k:
            warnings.warn(
                f"kmeans_df: k={k} but input has only {actual_k} rows; "
                f"proceeding with k={actual_k}",
                stacklevel=2,
            )
        for _ in range(max_iters):
            # Assignment WITHOUT the join-back (r14 — guide §1.2 step 1 /
            # §2.4: one shuffle fewer per iteration): the update step only
            # needs (cluster, __v), and __v is constant across the k
            # broadcast-fanned rows of one id, so it rides INSIDE the argmin
            # struct instead of being re-attached by the
            # assign_clusters_join(slim)-back-to-slim join. The comparator
            # is untouched — (s, j) is strictly ordered within an id group
            # (one row per cluster), so the trailing __v field can never
            # decide a min; assignments are bit-identical to
            # assign_clusters_join (pinned in tests).
            score = F.aggregate(
                F.zip_with(F.col("__v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            assigned = (
                slim.join(F.broadcast(cents))
                .groupBy(id_col)
                .agg(
                    F.min(
                        F.struct(
                            score.alias("s"),
                            F.col("cluster").alias("j"),
                            F.col("__v").alias("v"),
                        )
                    ).alias("__best")
                )
                .select(
                    F.col("__best").getField("j").alias("cluster"),
                    F.col("__best").getField("v").alias("__v"),
                )
            )
            means = (
                assigned.select(
                    "cluster", array_to_vector(F.col("__v")).alias("__vv")
                )
                .groupBy("cluster")
                .agg(F.count("*").alias("n"), Summarizer.sum(F.col("__vv")).alias("s"))
                .select(
                    "cluster",
                    _round(
                        F.transform(vector_to_array("s"), lambda x: x / F.col("n"))
                    ).alias("new_c"),
                )
            )
            # The per-cluster squared shift is computed IN the same plan the
            # checkpoint materializes (the old centroid is right there in
            # the join) — the former dedicated old x new join per iteration
            # is gone; the convergence probe below just max-reduces k
            # checkpointed rows (r14, guide §1.2 step 1).
            new_cents = _truncate_lineage(
                cents.join(means, "cluster", "left").select(
                    "cluster",
                    F.coalesce("new_c", "centroid").alias("centroid"),
                    F.aggregate(
                        F.zip_with(
                            F.col("centroid"),
                            F.coalesce("new_c", "centroid"),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("__shift"),
                ),
                reliable,
            )
            # convergence: ONE scalar (max squared centroid shift) — the
            # only driver-bound data in the whole loop
            shift = new_cents.agg(F.max("__shift").alias("m")).first()["m"]
            cents = new_cents.select("cluster", "centroid")
            if shift < tol:
                break
    finally:
        slim.unpersist()
    return assign_clusters_join(df, vec_col, cents, id_col), cents


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-scale path for billion-vector ANN.
# A dim-d float vector (4d bytes) becomes m uint8-ish codes (m bytes): the
# vector is split into m subspaces, each quantized against its own k-word
# codebook (k-means per subspace). Search uses asymmetric distance: the
# query's per-subspace distance table (m x k floats, driver-computed) enters
# the plan as a literal, so scoring a vector is m array lookups + adds —
# map-side, no join, no full-precision vectors read at query time.
# ---------------------------------------------------------------------------


def _slice_subspace(vec, m: int, sub: int, sub_dim: int):
    """Subvector for subspace ``sub`` (arrays are 1-indexed in F.slice)."""
    return F.slice(vec, sub * sub_dim + 1, sub_dim)


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    max_iters: int = 5,
    train_fraction: float | None = None,
    round_decimals: int | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks: k-means per subspace (m runs over the SAME scan,
    each on a sub_dim-wide slice). Returns codebooks[sub][code] -> centroid.
    dim must be divisible by m. ``round_decimals`` is forwarded to each
    subspace k-means (engine-portable codebooks — see kmeans).

    ``train_fraction``: train on a stable md5-bucket sample (the standard
    100 TB practice — codebooks converge on a 1-10% sample; ENCODING is the
    full-corpus pass, and it is map-side). Deterministic and engine-portable
    like every sampling path in this engine."""
    if train_fraction is not None:
        from tesla_competitive_intelligence_etl_pipeline_spark.operators.sampling import (
            sample_fraction,
        )

        df = sample_fraction(df, id_col, train_fraction)
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError(
            "pq_train: empty input (or train_fraction sampled zero rows)"
        )
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    vec = F.col(vec_col).cast("array<double>")
    codebooks = []
    for sub in range(m):
        sliced = df.select(
            F.col(id_col).alias("vec_id"),
            _slice_subspace(vec, m, sub, sub_dim).alias("sv"),
        )
        _, cents = kmeans(
            sliced, vec_col="sv", id_col="vec_id", k=k, max_iters=max_iters,
            round_decimals=round_decimals,
        )
        codebooks.append(cents)
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``pq_code`` (array<int>, length m): nearest codeword per subspace.
    Map-side expression; write this table instead of the float vectors for a
    dim*4/m compression of the searchable corpus."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    vec = F.col(vec_col).cast("array<double>")
    # one 2-D codebook literal + one transform lambda per subspace (constant
    # plan size in k_codes), mirroring assign_clusters' argmin form; the
    # factory binds `sub` without changing the lambda's arity (PySpark infers
    # the higher-order signature from it)
    def _subspace_argmin(sub: int):
        sliced = _slice_subspace(vec, m, sub, sub_dim)

        def picker(c, code):
            return F.struct(
                F.aggregate(
                    F.zip_with(sliced, c, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                code.alias("j"),
            )

        return F.array_min(
            F.transform(
                F.lit([[float(v) for v in c] for c in codebooks[sub]]), picker
            )
        ).getField("j")

    codes = F.array(*[_subspace_argmin(sub) for sub in range(m)])
    return df.withColumn("pq_code", codes)


def pq_build_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    max_iters: int = 5,
    train_fraction: float | None = None,
    round_decimals: int | None = None,
    fs=None,
    lease_owner: str | None = None,
    corpus: str | None = None,
) -> list[list[list[float]]]:
    """Materialize the PQ index — the one-time ingest/offline cost a
    deployment amortizes (the PQ twin of build_ivf_index): train codebooks
    (optionally on a stable sample), encode the FULL corpus map-side, and
    write ``path``/codes (id, pq_code — m small ints per vector, the
    dim*4/m-compressed searchable table) plus ``path``/codebooks (one row,
    m x k x sub_dim doubles). Online search then never touches the float
    vectors or retrains anything. The overwrite holds the index writer
    lease (r6) so a rebuild cannot interleave with a live append; training
    runs BEFORE the lease (no table state is read or written), so the held
    window is only the two writes — and a background heartbeat (r6 item 6)
    re-stamps the lease during the O(corpus) encode write, the one step
    that can outlive a conservative TTL at 100 TB. Returns the codebooks.

    ``corpus`` (r13 — VERDICT r12 item 3): when given, auto-registers the
    searchable ``codes`` table in the corpus' derived-store registry as
    kind ``'table'`` — a pure PQ index has no tombstone fan-out in
    takedown (no pq_index_delete), so it registers on the AUDIT surface:
    takedown names it under ``manual_tables`` and takedown_verify scans it
    for residual ids. The codebooks sidecar holds no per-id content and is
    not registered."""
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    books = pq_train(
        df, vec_col=vec_col, id_col=id_col, m=m, k=k,
        max_iters=max_iters, train_fraction=train_fraction,
        round_decimals=round_decimals,
    )
    token = mfs.acquire_writer_lease(fs, path, owner=lease_owner)
    try:
        with mfs.lease_heartbeat(fs, path, token):
            pq_encode(df, books, vec_col=vec_col).select(
                F.col(id_col), "pq_code"
            ).write.mode("overwrite").parquet(path + "/codes")
            df.sparkSession.createDataFrame(
                [(books,)], "codebooks array<array<array<double>>>"
            ).write.mode("overwrite").parquet(path + "/codebooks")
    finally:
        mfs.release_writer_lease(fs, path, token)
    if corpus is not None:
        from tesla_competitive_intelligence_etl_pipeline_spark.operators import takedown

        takedown.register_store(corpus, path + "/codes", "table", fs=fs)
    return books


def pq_load_codebooks(spark: SparkSession, path: str) -> list[list[list[float]]]:
    """Read back the (tiny) codebook table written by pq_build_index."""
    row = spark.read.parquet(path + "/codebooks").first()
    return [[list(c) for c in book] for book in row["codebooks"]]


def pq_index_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
    fs=None,
    lease_owner: str | None = None,
) -> int:
    """Incremental PQ index maintenance — the continual-ingest twin of
    ivf_index_append: encode ONLY the new batch against the STORED codebooks
    (the quantizer stays frozen — classic PQ deployment; re-train on the
    re-index cadence if drift accumulates) and append the (id, pq_code) rows
    to the codes table. Cost is a map-side encode of the batch plus the
    append write — O(batch), never a re-encode of the corpus.

    Crash-safe (VERDICT r5 item 1): staged in a dot-prefixed dir inside
    codes/ and committed through operators/index_commit's atomic-marker
    protocol — a crash leaves the codes table either exactly pre-append or
    (after the marker) rolled fully forward by recover_pq_index; readers
    never see a torn batch. Returns the number of rows appended, observed
    on the SAME evaluation as the write (no second scan of the batch, and
    the count cannot disagree with what landed)."""
    from pyspark.sql import Observation

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    obs = Observation()
    # single-writer contract enforced on the index root (r5 item 7). The
    # stored codebooks are read INSIDE the leased section (ADVICE r6, same
    # race as ivf_index_append): a re-train completing between an unleased
    # read and the write would encode the batch against the old quantizer —
    # codes unreadable by searches using the new codebooks. A caller-passed
    # `codebooks` skips the read and with it this protection (caller owns
    # the generation pin in that case).
    token = mfs.acquire_writer_lease(fs, path, owner=lease_owner)
    try:
        with mfs.lease_heartbeat(fs, path, token):
            if codebooks is None:
                codebooks = pq_load_codebooks(spark, path)
            tag, staging = index_commit.new_staging(path + "/codes")
            pq_encode(new_vectors, codebooks, vec_col=vec_col).select(
                F.col(id_col), "pq_code"
            ).observe(obs, F.count(F.lit(1)).alias("n")).write.parquet(staging)
            index_commit.commit_staged_append(fs, path + "/codes", tag)
    finally:
        mfs.release_writer_lease(fs, path, token)
    return int(obs.get["n"])


def recover_pq_index(path: str, fs=None) -> dict[str, list[str]]:
    """Heal a PQ codes table after a crashed pq_index_append: appends whose
    marker committed are rolled forward; marker-less staging is dropped as
    pre-commit debris (the PQ twin of similarity.recover_ivf_index).
    Idempotent — safe to run any time."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    return index_commit.recover_appends(fs or mfs.LOCAL_FS, path + "/codes")


def pq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance search over a MATERIALIZED PQ index
    (pq_build_index) — the online path: scan only the codes table (m ints
    per row), distance = m literal-table lookups, then the k-row top-k
    reduction. No training, no float vectors, no join in the timed plan."""
    if codebooks is None:
        codebooks = pq_load_codebooks(spark, path)
    encoded = spark.read.parquet(path + "/codes")
    return pq_topk(encoded, codebooks, query_vec, k=k, id_col=id_col)


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: distance table computed driver-side
    (m x k_codes floats), broadcast as a literal; per row the approximate
    squared distance is m table lookups summed — no float vectors touched.
    Returns (id, approx_sq_dist) ascending with a total order (dist, id)."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    table = [
        [
            sum(
                (query_vec[sub * sub_dim + i] - c[i]) ** 2
                for i in range(sub_dim)
            )
            for c in codebooks[sub]
        ]
        for sub in range(m)
    ]
    tbl_lit = F.lit([[float(d) for d in row] for row in table])
    dist = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.col("pq_code"),
            lambda sub, code: F.get(F.get(tbl_lit, sub), code),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        encoded.select(F.col(id_col), F.round(dist, 6).alias("approx_sq_dist"))
        .orderBy(F.col("approx_sq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cell probe + product-quantized shortlist + exact refine
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    m: int = 4,
    k: int = 16,
    max_iters: int = 5,
    train_fraction: float | None = None,
    round_decimals: int | None = None,
    fs=None,
    lease_owner: str | None = None,
    lease_ttl_sec: float = 3600.0,
    corpus: str | None = None,
) -> list[list[list[float]]]:
    """Materialize the combined IVF-PQ index — the production ANN layout
    (FAISS's IVFPQ + refine, re-expressed as Spark tables): PQ codebooks
    trained once (optionally on a stable md5-bucket sample), then FOUR
    tables under ``path``:

      vectors/    float vectors PARTITIONED BY cell (read only by the final
                  exact-refine step, and only the probed cells' partitions)
      codes/      (id, pq_code) PARTITIONED BY cell — the dim*4/m-compressed
                  shortlist table the ADC scan reads
      centroids/  one row per cell (the coarse quantizer, tiny)
      codebooks/  one row (m x k x sub_dim doubles)

    A search touches n_probe/n_cells of codes/ via parquet partition
    pruning, ranks those rows with m literal-table lookups each, and reads
    float vectors for only the k*refine-row shortlist — at 100 TB the heavy
    scan is the compressed codes of the probed cells, never the corpus.

    Tuning (measured, SCALING.md r7): ``m`` is the recall lever when
    neighbors are weakly separated — on the adversarial structureless
    corpus recall@10 doubles from m=4 (64x compression) to m=32 (8x), and
    at m=32 / refine=8 recall exactly meets the n_probe/n_cells
    probe-coverage bound (the ADC shortlist recovers every in-probe
    neighbor). Order of knobs: m to the corpus's separation, n_probe for
    recall vs scan cost, refine last (cheap — k*refine row fetches).

    Holds the index writer lease with a background heartbeat for the
    duration of the writes (training runs before the lease — it reads no
    table state), like build_ivf_index / pq_build_index.

    ``corpus`` (r13 — VERDICT r12 item 3): when given, the build
    auto-registers the index in the corpus' derived-store registry
    (takedown.register_store, kind 'ivfpq') after the writes commit, so
    no-args takedown / takedown_verify cover it with no manual
    registration step. Omit only for corpus-less scratch indexes."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        _cell_centroids,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    books = pq_train(
        df, vec_col=vec_col, id_col=id_col, m=m, k=k,
        max_iters=max_iters, train_fraction=train_fraction,
        round_decimals=round_decimals,
    )
    token = mfs.acquire_writer_lease(fs, path, owner=lease_owner, ttl_sec=lease_ttl_sec)
    try:
        with mfs.lease_heartbeat(fs, path, token, ttl_sec=lease_ttl_sec):
            df.write.mode("overwrite").partitionBy(cell_col).parquet(
                path + "/vectors"
            )
            pq_encode(df, books, vec_col=vec_col).select(
                F.col(id_col), F.col(cell_col), "pq_code"
            ).write.mode("overwrite").partitionBy(cell_col).parquet(path + "/codes")
            _cell_centroids(df, vec_col, cell_col).write.mode(
                "overwrite"
            ).parquet(path + "/centroids")
            df.sparkSession.createDataFrame(
                [(books,)], "codebooks array<array<array<double>>>"
            ).write.mode("overwrite").parquet(path + "/codebooks")
    finally:
        mfs.release_writer_lease(fs, path, token)
    if corpus is not None:
        from tesla_competitive_intelligence_etl_pipeline_spark.operators import takedown

        takedown.register_store(corpus, path, "ivfpq", fs=fs)
    return books


def _ivfpq_search(
    centroids: DataFrame,
    codes: DataFrame,
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int,
    n_probe: int,
    refine: int,
    id_col: str,
    vec_col: str,
    cell_col: str,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Shared IVF-PQ search core: probe the n_probe cells whose centroid is
    nearest the query (an n_probe-row collect — the standard IVF probe),
    ADC-rank ONLY those cells' PQ codes into a k*refine shortlist, then
    exact-cosine re-rank the shortlist against the float vectors (broadcast
    semi of the tiny shortlist into the probed partitions). Deterministic
    end-to-end: every score is rounded to 6 decimals with id tiebreaks, so
    the probe set, the shortlist SET, and the final order are all
    engine-portable (the DuckDB oracle re-derives each stage)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        cosine,
    )

    qlit = F.lit([float(v) for v in query_vec])
    probed_rows = (
        centroids.select(
            cell_col, F.round(cosine(F.col("centroid"), qlit), 6).alias("c_sim")
        )
        .orderBy(F.desc("c_sim"), F.asc(cell_col))
        .limit(n_probe)
        .collect()
    )
    cells = [r[cell_col] for r in probed_rows]
    cand = codes.filter(F.col(cell_col).isin(cells))
    if tombstones is not None:
        # takedown (r8): ONE anti-join ahead of the ADC scan removes
        # tombstoned ids from candidacy entirely — the shortlist (and
        # therefore the refine join) then provably excludes them, and
        # with frozen quantizers the results equal an index that never
        # contained those vectors (pinned in tests).
        cand = cand.join(tombstones.select(id_col), id_col, "left_anti")
    shortlist = pq_topk(
        cand,
        codebooks,
        [float(v) for v in query_vec],
        k=k * refine,
        id_col=id_col,
    )
    return (
        vectors.filter(F.col(cell_col).isin(cells))
        .join(F.broadcast(shortlist.select(id_col)), id_col)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk_indexed(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ search over a MATERIALIZED index (build_ivfpq_index) — the
    online path. The probed-cell filter lands in the codes AND vectors
    scans' PartitionFilters (asserted in tests/test_plans.py), the ADC scan
    reads only (id, cell, pq_code), and the refine step reads float vectors
    for just the broadcast k*refine shortlist. Returns (id, cos_sim)
    descending with a total (cos_sim, id) order."""
    if codebooks is None:
        codebooks = pq_load_codebooks(spark, path)
    return _ivfpq_search(
        spark.read.parquet(path + "/centroids"),
        spark.read.parquet(path + "/codes"),
        spark.read.parquet(path + "/vectors"),
        codebooks,
        query_vec,
        k, n_probe, refine, id_col, vec_col, cell_col,
        tombstones=load_tombstones(spark, path),
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_probe: int = 2,
    refine: int = 4,
    m: int = 4,
    k_codes: int = 16,
    max_iters: int = 5,
    train_fraction: float | None = None,
    round_decimals: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Ad-hoc IVF-PQ search straight off a DataFrame (no materialized
    index): train-or-take codebooks, derive the coarse centroids, encode and
    ADC-rank only the probed cells (the cell filter pushes below the
    map-side encode projection), exact-refine the shortlist. Same
    parameters and identical results to build_ivfpq_index +
    ivfpq_topk_indexed (pinned in tests) — use the indexed pair when the
    corpus outlives one query."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        _cell_centroids,
    )

    if codebooks is None:
        codebooks = pq_train(
            embeddings, vec_col=vec_col, id_col=id_col, m=m, k=k_codes,
            max_iters=max_iters, train_fraction=train_fraction,
            round_decimals=round_decimals,
        )
    query_vec = [
        float(x)
        for x in embeddings.filter(F.col(id_col) == query_id).first()[vec_col]
    ]
    codes = pq_encode(embeddings, codebooks, vec_col=vec_col).select(
        F.col(id_col), F.col(cell_col), "pq_code"
    )
    return _ivfpq_search(
        _cell_centroids(embeddings, vec_col, cell_col),
        codes,
        embeddings,
        codebooks,
        query_vec,
        k, n_probe, refine, id_col, vec_col, cell_col,
    )


def ivfpq_index_append(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    fs=None,
    lease_owner: str | None = None,
) -> int:
    """Incremental maintenance of the COMBINED IVF-PQ index: assign each
    new vector to its nearest existing cell centroid (max cosine, the
    probe's metric) and encode it against the STORED codebooks — both
    quantizers stay frozen (classic deployment; rebuild on the re-index
    cadence if drift accumulates) — then append to vectors/ AND codes/ as
    ONE transaction. Cost is O(batch): a map-side assign + encode and two
    staged writes, never a read of the corpus.

    Crash-safe across BOTH tables: the batch stages in dot-prefixed dirs
    inside each table and commits through a SINGLE atomic marker at the
    index root (index_commit.commit_staged_append_multi) — a crash leaves
    the whole index either exactly pre-append or, after the marker, rolled
    fully forward by recover_ivfpq_index; readers can never see codes
    whose vectors are missing (vectors land first) or a torn batch in
    either table.

    The codes staging is derived by READING BACK the staged vectors — one
    source of truth, so the codes can never disagree with the vectors that
    actually landed (a second evaluation of a non-deterministic batch plan
    could). Centroids and codebooks are read INSIDE the leased section
    (same generation-pin as ivf_index_append/pq_index_append). Returns the
    number of rows appended, observed on the vectors write itself."""
    from pyspark.sql import Observation

    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        cosine,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    obs = Observation()
    token = mfs.acquire_writer_lease(fs, path, owner=lease_owner)
    try:
        with mfs.lease_heartbeat(fs, path, token):
            codebooks = pq_load_codebooks(spark, path)
            cents_rows = (
                spark.read.parquet(path + "/centroids").orderBy(cell_col).collect()
            )
            cells = [r[cell_col] for r in cents_rows]
            cents = [[float(v) for v in r["centroid"]] for r in cents_rows]
            vec = F.col(vec_col).cast("array<double>")
            pairs = F.transform(
                F.lit(cents),
                lambda c, j: F.struct(
                    F.round(cosine(vec, c), 9).alias("s"), j.alias("j")
                ),
            )
            assigned = new_vectors.select(
                F.col(id_col),
                F.col(vec_col),
                F.get(F.lit(cells), F.array_max(pairs).getField("j")).alias(
                    cell_col
                ),
            ).observe(obs, F.count(F.lit(1)).alias("n"))
            tag, vec_staging = index_commit.new_staging(path + "/vectors")
            assigned.write.partitionBy(cell_col).parquet(vec_staging)
            staged = spark.read.parquet(vec_staging)
            pq_encode(staged, codebooks, vec_col=vec_col).select(
                F.col(id_col), F.col(cell_col), "pq_code"
            ).write.partitionBy(cell_col).parquet(
                index_commit.staging_path(path + "/codes", tag)
            )
            index_commit.commit_staged_append_multi(
                fs, path, tag, ["vectors", "codes"]
            )
    finally:
        mfs.release_writer_lease(fs, path, token)
    return int(obs.get["n"])


def ivfpq_index_delete(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    id_col: str = "vec_id",
    fs=None,
    lease_owner: str | None = None,
) -> int:
    """TAKEDOWN for the IVF-PQ index (r8): tombstone the given ids so
    every subsequent search behaves exactly as if the index never
    contained them — the propagation target for a corpus
    delete_from_merge_table (feed read_commit_changes' delete records
    here; composition pinned in tests). Physically the vectors/codes rows
    stay (their cells' files are immutable); one tiny append lands the
    distinct ids in ``tombstones/`` through the same atomic-marker commit
    as the data appends, and both search paths anti-join it ahead of the
    ADC scan. O(batch); ids absent from the index are harmless;
    re-deleting is idempotent (anti-join semantics). Physical purge is
    the scheduled re-index (build_ivfpq_index on the surviving corpus),
    the same cadence that refreshes drifted quantizers — tombstones are
    the cheap interim, exactly FAISS's remove-vs-rebuild trade. Returns
    the number of tombstone ids appended. (Shared primitive:
    similarity.tombstone_ids — the plain IVF index has the same takedown
    via similarity.ivf_index_delete.)"""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        tombstone_ids,
    )

    return tombstone_ids(spark, path, keys, id_col=id_col, fs=fs,
                         lease_owner=lease_owner)


def load_tombstones(spark: SparkSession, path: str, fs=None) -> DataFrame | None:
    """The index's committed tombstone ids, or None when nothing was ever
    deleted (alias of similarity.load_tombstones)."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import similarity

    return similarity.load_tombstones(spark, path, fs=fs)


def recover_ivfpq_index(path: str, fs=None) -> dict[str, list[str]]:
    """Heal a combined IVF-PQ index after a crashed ivfpq_index_append,
    ivfpq_index_delete, or compact_ivfpq_index: root-marker appends roll
    forward across BOTH data tables (vectors first); tombstone appends
    roll forward from their own in-table markers; crashed compaction
    swaps in either table are redone-or-cleared from their per-cell
    markers; marker-less staging is dropped as pre-commit debris.
    Idempotent — safe to run any time."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        _recover_swaps,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    out = index_commit.recover_multi_appends(fs, path, ["vectors", "codes"])
    out.setdefault("restored", [])
    for table in ("vectors", "codes"):
        swaps = _recover_swaps(fs, path + "/" + table)
        out["restored"].extend(swaps["restored"])
        out["removed"].extend(swaps["removed"])
    if fs.isdir(path + "/tombstones"):
        t = index_commit.recover_appends(fs, path + "/tombstones")
        out["restored"].extend(t.get("completed", []))
        out["removed"].extend(t.get("removed", []))
    return out


def compact_ivfpq_index(
    spark: SparkSession,
    path: str,
    max_files_per_cell: int = 8,
    target_files_per_cell: int = 1,
    fs=None,
    lease_owner: str | None = None,
    purge_tombstones: bool = False,
    id_col: str = "vec_id",
) -> dict:
    """Small-file compaction for a continuously-appended IVF-PQ index:
    every ivfpq_index_append leaves one-plus files per touched cell in
    BOTH tables, and the codes table — the one every search ADC-scans —
    feels the file-open cost first. Rewrites over-threshold cells of
    vectors/ AND codes/ through the same per-cell atomic-swap protocol as
    compact_ivf_index (shared `_compact_table_cells`; crash healing via
    recover_ivfpq_index, run first). Without purging, content never
    changes, so no cross-table transaction is needed — each cell swap is
    independently atomic and search results are identical throughout.
    Returns {"vectors": {cell: files}, "codes": {cell: files}} for
    rewritten cells.

    ``purge_tombstones=True`` (r9 — VERDICT r8 item 2): physically drop
    tombstoned rows from BOTH tables while rewriting exactly the cells
    that hold them — O(touched cells) erasure instead of the full
    re-index that was previously the only purge path
    (ivfpq_index_delete's documented trade) — then atomically clear the
    satisfied tombstones. Order is crash-safe without a cross-table
    transaction BECAUSE the tombstones are cleared strictly last: until
    then, every search still anti-joins them (a half-purged index answers
    identically), and a re-run converges; recover_ivfpq_index heals any
    crashed cell swap. Tombstone appends take the same writer lease, so
    the tombstone set is frozen for the duration. Adds ``purged_rows``
    (across both tables) and ``tombstones_cleared`` to the returned
    dict."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        _compact_table_cells,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    token = mfs.acquire_writer_lease(fs, path, owner=lease_owner)
    try:
        recover_ivfpq_index(path, fs)
        purge_ids = None
        if purge_tombstones:
            tombs = load_tombstones(spark, path, fs)
            if tombs is not None:
                purge_ids = tombs.select(id_col).distinct()
        out: dict = {}
        purged = 0
        for table in ("vectors", "codes"):
            rewritten, dropped = _compact_table_cells(
                spark, fs, path, path + "/" + table,
                max_files_per_cell, target_files_per_cell, token,
                purge_ids=purge_ids, id_col=id_col,
            )
            out[table] = rewritten
            purged += dropped
        if purge_tombstones:
            cleared = False
            if fs.isdir(path + "/tombstones"):
                # strictly after BOTH tables were purged (see docstring)
                fs.rmtree(path + "/tombstones")
                cleared = True
            out["purged_rows"] = purged
            out["tombstones_cleared"] = cleared
        return out
    finally:
        mfs.release_writer_lease(fs, path, token)


def ivfpq_tombstoned_rows(
    spark: SparkSession, path: str, fs=None, id_col: str = "vec_id"
) -> int:
    """Tombstoned rows still physically ON DISK across vectors/ and
    codes/ — the purge-debt gauge (0 after
    compact_ivfpq_index(purge_tombstones=True)). Reads the id column
    only."""
    tombs = load_tombstones(spark, path, fs=fs)
    if tombs is None:
        return 0
    ids = F.broadcast(tombs.select(id_col).distinct())
    return sum(
        spark.read.parquet(path + "/" + t).join(ids, id_col, "semi").count()
        for t in ("vectors", "codes")
    )


def ivfpq_index_stats(path: str, fs=None) -> dict:
    """Operational stats for a combined IVF-PQ index — per-table committed
    cell/file counts plus append/compaction debris and the lease state (the
    IVF-PQ twin of similarity.ivf_index_stats). Rising
    ``max_files_per_cell`` in either table is the compact_ivfpq_index
    signal; non-zero debris is the recover_ivfpq_index signal."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators import index_commit
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        cell_file_counts,
    )
    from tesla_competitive_intelligence_etl_pipeline_spark.streaming import fs as mfs

    fs = fs or mfs.LOCAL_FS
    out: dict = {"lease": mfs.lease_info(fs, path)}
    root_entries = fs.listdir(path) if fs.isdir(path) else []
    out["multi_append_markers"] = sum(
        1 for e in root_entries if e.startswith(index_commit.MULTI_MARKER_PREFIX)
    )
    tdir = path + "/tombstones"
    out["tombstone_files"] = (
        sum(1 for e in fs.listdir(tdir) if e.endswith(".parquet"))
        if fs.isdir(tdir)
        else 0
    )
    for table in ("vectors", "codes"):
        tdir = path + "/" + table
        counts = cell_file_counts(tdir, fs) if fs.isdir(tdir) else {}
        entries = fs.listdir(tdir) if fs.isdir(tdir) else []
        out[table] = {
            "cells": len(counts),
            "data_files": sum(counts.values()),
            "max_files_per_cell": max(counts.values(), default=0),
            "append_staging_dirs": sum(
                1 for e in entries if e.startswith(index_commit.STAGING_PREFIX)
            ),
            "compact_staging_dirs": sum(
                1 for e in entries if e.startswith(".compact_")
            ),
            "swap_markers": sum(1 for e in entries if e.startswith(".swap_")),
        }
    return out


def ivfpq_topk_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """BATCH IVF-PQ search: top-k neighbors for EVERY row of a query table
    in ONE distributed plan — the production bulk-retrieval path ("embed
    the crawl, find neighbors for every new doc"). A driver-side loop over
    ivfpq_topk_indexed is the collect-and-iterate anti-pattern this
    operator exists to replace.

    Plan shape (no per-query driver work at all):
      1. probe table: queries x broadcast(centroids) -> cosine ->
         per-query top-n_probe window; each probe row CARRIES the query's
         ADC distance table (m x k_codes doubles, computed map-side from
         the codebook literal) and its float vector.
      2. candidates: codes JOIN broadcast(probe) on cell — one broadcast
         delivers cells, distance tables, and query vectors; the parquet
         codes scan is pruned to the UNION of probed cells via dynamic
         partition pruning (asserted in tests/test_plans.py).
      3. ADC: m lookups per (candidate, query) row into the joined
         distance-table column; per-query k*refine shortlist window.
      4. refine: vectors JOIN broadcast(shortlist) -> exact cosine ->
         per-query top-k window.
    Every score is rounded with id tiebreaks, so results are
    engine-portable (DuckDB oracle re-derives all four stages) and
    identical to per-query ivfpq_topk_indexed calls (pinned in tests).

    Scale notes: the broadcast probe table is n_queries x n_probe rows
    (each ~m*k_codes + dim doubles) — fine into the 10^5-query range;
    past that Spark's broadcast threshold flips the joins to shuffles,
    which is the correct plan at that scale anyway. The candidate fan-out
    (sum over queries of probed-cell row counts) is the irreducible work
    of batch ANN; n_probe is the lever. Returns (query_id, id, cos_sim),
    k rows per query."""
    from tesla_competitive_intelligence_etl_pipeline_spark.operators.similarity import (
        cosine,
    )

    if codebooks is None:
        codebooks = pq_load_codebooks(spark, path)
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    centroids = spark.read.parquet(path + "/centroids")
    codes = spark.read.parquet(path + "/codes")
    vectors = spark.read.parquet(path + "/vectors")
    tombstones = load_tombstones(spark, path)
    if tombstones is not None:
        # takedown (r8): same single anti-join as the per-query path —
        # tombstoned ids never reach the ADC stage of ANY query
        codes = codes.join(tombstones.select(id_col), id_col, "left_anti")

    qvec = F.col(query_vec_col).cast("array<double>")

    def _sub_dists(sub: int):
        sliced = _slice_subspace(qvec, m, sub, sub_dim)
        return F.transform(
            F.lit([[float(v) for v in c] for c in codebooks[sub]]),
            lambda c: F.aggregate(
                F.zip_with(sliced, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.array(*[_sub_dists(sub) for sub in range(m)]).alias("__dtab"),
    )
    from pyspark.sql import Window

    probe_w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__c_sim"), F.asc(cell_col)
    )
    probe = (
        q.join(F.broadcast(centroids))
        .withColumn(
            "__c_sim", F.round(cosine(F.col("centroid"), F.col(query_vec_col)), 6)
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select(query_id_col, cell_col, query_vec_col, "__dtab")
    )
    adc = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.col("pq_code"),
            lambda sub, code: F.get(F.get(F.col("__dtab"), sub), code),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    short_w = Window.partitionBy(query_id_col).orderBy(
        F.asc("__adc"), F.asc(id_col)
    )
    shortlist = (
        codes.join(F.broadcast(probe), cell_col)
        .withColumn("__adc", F.round(adc, 6))
        .withColumn("__sr", F.row_number().over(short_w))
        .filter(F.col("__sr") <= k * refine)
        # the candidate's cell rides along (r14 — VERDICT r13 item 6, guide
        # §6 partition pruning): joining the refine scan on (cell, id)
        # instead of id alone lets dynamic partition pruning cut the
        # cell-partitioned vectors/ table to the shortlisted cells — the
        # per-query path prunes via its isin() filter, but this batch path
        # previously read EVERY cell's float vectors to refine a few
        # hundred rows. Candidates are unchanged: codes and vectors carry
        # the SAME cell for an id (both written from one assignment), so
        # the extra equi-key drops nothing.
        .select(query_id_col, cell_col, id_col, query_vec_col)
    )
    final_w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        vectors.join(F.broadcast(shortlist), [cell_col, id_col])
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("__fr", F.row_number().over(final_w))
        .filter(F.col("__fr") <= k)
        .drop("__fr")
    )
