"""Incremental near-duplicate detection for ARRIVING documents.

Beyond-reference scope (the reference is strictly batch): a training-data
pipeline deduplicates each new document against the corpus it has ALREADY
ingested, not against a frozen snapshot. This module maintains a SimHash-64
signature table under ``foreachBatch`` and flags every arriving document
whose signature is within ``max_hamming`` of an earlier one.

Semantics (deterministic, so re-delivery is idempotent):

    doc D in micro-batch k is flagged as a near-dup of C iff
    hamming(sig(D), sig(C)) <= max_hamming and C arrived STRICTLY earlier —
    batch(C) < k, or batch(C) == k and C's id < D's id (within-batch order).
    ``dup_of`` is the matching doc with the smallest (hamming, id).

Join shape is the same banded Manku equi-join as the batch operator
(``dedup.simhash_band_keys``): new signatures equi-join the corpus on
(band, value) with the arrival-order rule as a residual predicate — one
shuffle per micro-batch, never all-pairs, and the corpus side reads only the
signature table (16 bytes/doc), never the corpus text.

Idempotence / restart: signatures, flags, and the band index are written
with dynamic partition overwrite keyed by ``batch_id`` (the index also by
``vb``); a re-delivered batch k recomputes from partitions with
``batch_id < k`` (its own failed partial write is excluded by the filter)
and replaces exactly its own partitions. The corpus probe reads the BAND
INDEX partition-pruned to the vb buckets the batch's own band values hash
into (``make_dedup_batch``), so per-batch read cost tracks the batch size,
not the corpus size, and the join cost is |batch| x corpus collisions.

ONLINE CLUSTERS: pairwise flags go stale when an arriving doc BRIDGES two
existing clusters, so the batch body also maintains a union-find-as-log
(``_update_clusters``): an ``assignments`` table (doc -> label at arrival)
and a tiny ``label_moves`` table (losing root -> winning root, one row per
merge event), both batch-partitioned dynamic overwrite like everything
else. ``read_cluster_labels`` resolves the move chains into the promoted
"one representative per cluster" view, which provably equals a full batch
recluster over every match seen so far (q_dup_clusters_incr pins it against
the recursive-CTE connected-components oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.dedup import connected_components, simhash64, simhash_band_keys
# has_parquet: the shared crash-safe probe (io.py); module-private alias kept
# for existing callers and segment_stream's import
from ..io import has_parquet as _has_parquet, parallel_actions, require_local


N_VALUE_BUCKETS = 16  # band-index partition fan-out; see make_dedup_batch
N_DOC_BUCKETS = 16    # assignment-table fan-out; see _update_clusters


def dedup_paths(out_root: str) -> tuple[str, str, str]:
    """(signatures, dup_flags, band_index) parquet roots. signatures/dup_flags
    partition by batch_id; band_index by (batch_id, vb) — vb = pmod(band
    value, N_VALUE_BUCKETS) is the probe-pruning key (module doc).

    ``out_root`` must be local: this module's existence/geometry probes are
    ``os.path`` based (io.require_local explains the loud-failure rationale).
    """
    out_root = require_local(out_root, "streaming-dedup out_root")
    return (
        os.path.join(out_root, "signatures"),
        os.path.join(out_root, "dup_flags"),
        os.path.join(out_root, "band_index"),
    )


def _stored_scheme(out_root: str) -> str | None:
    """The scheme persisted in _dedup_geometry.json, if any (the SimHash
    body predates the key, so its geometries have none)."""
    import json

    path = os.path.join(out_root, "_dedup_geometry.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get("scheme", "simhash")
    except ValueError:
        return None


def read_flags(spark: SparkSession, out_root: str,
               id_type: str = "bigint", scheme: str | None = None) -> DataFrame:
    """dup_flags as a DataFrame; an empty TYPED frame when no batch has
    flagged anything yet (a flag-free batch writes no parquet files, so a
    bare read could not infer the schema). The empty schema's int batch
    columns match what a real read infers (``F.lit(bid)`` data and partition
    inference are both IntegerType), so consumers see ONE schema on both
    paths. The score column differs per scheme (SimHash: ``hamming`` int,
    MinHash: ``n_bands_hit`` bigint); by default it is read from the store's
    persisted geometry, so a bare ``read_flags(spark, root)`` types correctly
    for either scheme — pass ``scheme`` only for a root with no geometry
    file yet."""
    out_root = require_local(out_root, "streaming-dedup out_root")
    flag_path = dedup_paths(out_root)[1]
    if _has_parquet(flag_path):
        return spark.read.parquet(flag_path)
    if scheme is None:
        scheme = _stored_scheme(out_root) or "simhash"
    if scheme.startswith("simhash-sig:"):
        scheme = "simhash"  # injected kernels flag on the simhash schema
    scores = {"simhash": "hamming int", "minhash": "n_bands_hit bigint"}
    if scheme not in scores:
        raise ValueError(f"unknown dedup scheme {scheme!r}; one of {sorted(scores)}")
    return spark.createDataFrame(
        [],
        f"doc {id_type}, dup_of {id_type}, dup_batch int, "
        f"{scores[scheme]}, batch_id int",
    )


def cluster_paths(out_root: str) -> tuple[str, str]:
    """(assignments, label_moves) parquet roots for ONLINE cluster
    maintenance (union-find as a batch-partitioned log; see
    ``_update_clusters``). assignments partition by (batch_id, db =
    pmod(xxhash64(doc), N_DOC_BUCKETS)); label_moves by batch_id."""
    out_root = require_local(out_root, "streaming-dedup out_root")
    return (
        os.path.join(out_root, "assignments"),
        os.path.join(out_root, "label_moves"),
    )


def _geometry_guard(out_root: str, geometry: dict,
                    filename: str = "_dedup_geometry.json") -> None:
    """Persist the banding geometry next to the index on first use; refuse to
    run under a DIFFERENT geometry — joining new band keys against an index
    built with other (n_blocks, max_hamming, n_value_buckets) silently
    compares incompatible key spaces and un-flags real duplicates.

    One ADDITIVE upgrade is allowed: a store written before cluster
    maintenance existed lacks the 'n_doc_buckets' key; enabling clusters on
    it only adds that key (the banding key space is unchanged), so the stored
    geometry is upgraded in place — the missing cluster log itself is then
    rebuilt by ``_rebuild_cluster_log``.

    ``filename`` lets non-banding stores (curate_io's curated output, the
    incremental curation runner) reuse the same persist-and-refuse contract
    under their own sidecar name; ``geometry`` must be JSON-round-trip
    stable (lists, not tuples) — the comparison is against the parsed
    file."""
    import json

    path = os.path.join(out_root, filename)
    if os.path.exists(path):
        try:
            with open(path) as f:
                stored = json.load(f)
        except ValueError:
            stored = None  # crash mid-write left a truncated file: rewrite it
        if stored is not None:
            additive_upgrade = (
                stored != geometry
                and set(geometry) - set(stored) == {"n_doc_buckets"}
                and {k: geometry[k] for k in stored} == stored
            )
            if stored != geometry and not additive_upgrade:
                raise ValueError(
                    f"streaming-dedup geometry mismatch at {out_root}: index "
                    f"was built with {stored}, this run uses {geometry}; "
                    "rebuild the index or restore the original parameters"
                )
            if not additive_upgrade:
                return  # exact match: nothing to rewrite
    os.makedirs(out_root, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(geometry, f)
    os.replace(tmp, path)  # atomic: no truncated file survives a crash




def _bands(sigs: DataFrame, n_blocks: int, max_hamming: int) -> DataFrame:
    return sigs.select(
        "doc", "batch_id", "simhash_hi", "simhash_lo",
        F.posexplode(simhash_band_keys(n_blocks, max_hamming)).alias("band", "value"),
    )


def near_dup_flags(new_sigs: DataFrame, corpus_sigs: DataFrame,
                   max_hamming: int = 3, n_blocks: int = 4) -> DataFrame:
    """Flag docs in ``new_sigs`` against strictly-earlier docs in
    ``corpus_sigs`` (both: doc, batch_id, simhash_hi, simhash_lo).

    Returns (doc, batch_id, dup_of, dup_batch, hamming) — one row per flagged
    doc, ``dup_of`` = the earlier match minimizing (hamming, doc id)."""
    return _flags_from_bands(
        _bands(new_sigs, n_blocks, max_hamming),
        _bands(corpus_sigs, n_blocks, max_hamming),
        max_hamming,
    )


def _matches_from_bands(new_bands: DataFrame, corpus_bands: DataFrame,
                        max_hamming: int) -> DataFrame:
    """ALL verified near-dup pairs (doc, batch_id, dup_of, dup_batch,
    hamming) from the banded equi-join + popcount verify — the full match
    set, one row per (doc, dup_of) pair. The flag view picks the best match
    per doc; cluster maintenance needs every match (a new doc near two
    clusters BRIDGES them, which the best-only flag cannot express)."""
    cols = ["doc", "batch_id", "simhash_hi", "simhash_lo", "band", "value"]
    n = new_bands.select(cols).alias("n")
    c = corpus_bands.select(cols).alias("c")
    earlier = (F.col("c.batch_id") < F.col("n.batch_id")) | (
        (F.col("c.batch_id") == F.col("n.batch_id"))
        & (F.col("c.doc") < F.col("n.doc"))
    )
    ham = (
        F.bit_count(F.col("n.simhash_hi").bitwiseXOR(F.col("c.simhash_hi")))
        + F.bit_count(F.col("n.simhash_lo").bitwiseXOR(F.col("c.simhash_lo")))
    ).cast("int")
    return (
        n.join(
            c,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.value") == F.col("c.value"))
            & earlier,
        )
        .select(
            F.col("n.doc").alias("doc"),
            F.col("n.batch_id").alias("batch_id"),
            F.col("c.doc").alias("dup_of"),
            F.col("c.batch_id").alias("dup_batch"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a true pair co-matches in up to n_bands bands
    )


def _flags_from_matches(matches: DataFrame) -> DataFrame:
    """Best match per doc: minimize (hamming, dup_of, dup_batch)."""
    best = F.min(F.struct("hamming", "dup_of", "dup_batch")).alias("m")
    return (
        matches.groupBy("doc", "batch_id")
        .agg(best)
        .select(
            "doc", "batch_id",
            F.col("m.dup_of").alias("dup_of"),
            F.col("m.dup_batch").alias("dup_batch"),
            F.col("m.hamming").alias("hamming"),
        )
    )


def _flags_from_bands(new_bands: DataFrame, corpus_bands: DataFrame,
                      max_hamming: int) -> DataFrame:
    """The banded equi-join + popcount verify + min-match pick, over
    pre-banded rows (doc, batch_id, simhash_hi, simhash_lo, band, value)."""
    return _flags_from_matches(
        _matches_from_bands(new_bands, corpus_bands, max_hamming)
    )


def _batch_dirs(path: str) -> set[int]:
    """batch_id partition values present as directories — a local listing,
    no Spark job (this module is local-FS-only per require_local)."""
    if not os.path.isdir(path):
        return set()
    out = set()
    for d in os.listdir(path):
        if d.startswith("batch_id="):
            try:
                out.add(int(d.split("=", 1)[1]))
            except ValueError:
                pass
    return out


def _cluster_backlog(src_path: str, asg_path: str, bid: int) -> list[int]:
    """Batches < bid present in the signature/band table but ABSENT from the
    cluster log — plus the newest logged batch at the gap boundary, which a
    replay crash can leave partially written. The previous gate ("replay iff
    the log is missing entirely") silently truncated the log when a replay
    crashed after its first batch: the restart saw assignments present and
    skipped batches the crash never reached. Empty when the log is caught up
    (the common case: two directory listings, no jobs)."""
    present = {k for k in _batch_dirs(src_path) if k < bid}
    done = {k for k in _batch_dirs(asg_path) if k < bid}
    missing = present - done
    if not missing:
        return []
    below = [k for k in done if k < min(missing)]
    boundary = {max(below)} if below else set()
    return sorted(missing | boundary)


def _read_moves(spark: SparkSession, mov_path: str, id_type: str,
                before_batch: int | None = None) -> DataFrame:
    """label_moves as (src, dst), optionally only batches < before_batch; an
    empty typed frame when no move has been recorded."""
    if _has_parquet(mov_path):
        mv = spark.read.parquet(mov_path)
        if before_batch is not None:
            mv = mv.filter(F.col("batch_id") < before_batch)
        return mv.select("src", "dst")
    return spark.createDataFrame([], f"src {id_type}, dst {id_type}")


_MOVES_LOCAL_MAX = 100_000  # bounded driver read (a few MB of id pairs)


def _apply_moves(lab: DataFrame, moves: DataFrame,
                 max_iters: int = 30) -> DataFrame:
    """Resolve union-find pointer chains: replace ``label`` by ``moves.dst``
    until no label is a move ``src``. Each move was recorded against the
    RESOLVED root at creation time, so a chain only deepens when an old root
    later loses a merge — depth stays shallow and this converges in a few
    broadcast joins (moves hold one row per cluster-merge event, tiny
    relative to the corpus). ``lab``: (doc, label) rows.

    Small move logs take a BOUNDED driver fast path (the
    connected_components _CC_LOCAL_MAX_EDGES pattern): the per-hop loop
    costs [join + changed-probe job + localCheckpoint] per hop and runs in
    EVERY batch body and every promoted read, while the move log holds one
    row per cluster-merge EVENT — tiny by construction. When at most
    ``_MOVES_LOCAL_MAX`` moves exist (probed with a limit-bounded collect),
    the chains are path-compressed driver-side and applied in ONE broadcast
    join; each src maps to its terminal dst, so one application IS the
    fixpoint — identical labels by construction. Larger logs fall through
    to the iterative loop unchanged."""
    probe = moves.limit(_MOVES_LOCAL_MAX + 1).collect()
    if len(probe) <= _MOVES_LOCAL_MAX:
        if not probe:
            return lab
        m = {r["src"]: r["dst"] for r in probe}

        def find(x):
            seen = []
            while x in m:
                seen.append(x)
                x = m[x]
                if len(seen) > len(m):
                    raise RuntimeError(
                        "cycle in label_moves — the log is corrupt"
                    )
            for s in seen:  # path compression
                m[s] = x
            return x

        resolved = [(s, find(s)) for s in list(m)]
        id_type = dict(moves.dtypes)["src"]
        mdf = lab.sparkSession.createDataFrame(
            resolved, f"src {id_type}, dst {id_type}"
        )
        return lab.join(
            F.broadcast(mdf), lab["label"] == mdf["src"], "left"
        ).select(
            lab["doc"], F.coalesce(mdf["dst"], lab["label"]).alias("label")
        )
    for _ in range(max_iters):
        j = lab.join(F.broadcast(moves), lab["label"] == moves["src"], "left")
        changed = j.filter(F.col("dst").isNotNull()).limit(1).count()
        if changed == 0:
            return lab
        lab = j.select(
            lab["doc"], F.coalesce(moves["dst"], lab["label"]).alias("label")
        ).localCheckpoint()
    raise RuntimeError(
        f"_apply_moves did not resolve in {max_iters} hops. Chain depth grows "
        "one hop each time an old cluster root loses a later merge; a long-"
        "running stream accumulates these — run compact_cluster_log(out_root) "
        "(path compression) to reset resolution to zero hops, then retry"
    )


def _update_clusters(spark: SparkSession, out_root: str, batch_docs: DataFrame,
                     matches: DataFrame, bid: int,
                     n_doc_buckets: int = N_DOC_BUCKETS) -> None:
    """ONLINE cluster maintenance (union-find as a batch-partitioned log).

    The pairwise flags alone go stale when an arriving doc BRIDGES two
    existing clusters — batch reclustering (functions.dedup.dup_clusters)
    would be a full-corpus job per batch. Instead two idempotent tables keep
    "one representative per cluster" current:

    * ``assignments`` (doc, label, batch_id, db): label assigned when the doc
      arrived = min doc id of its component AT THAT TIME (the resolved root);
      partitioned by (batch_id, db = pmod(xxhash64(doc), n_doc_buckets)) so a
      batch's label lookups partition-prune to the db buckets its matched
      docs hash into — read cost tracks batch size, not corpus size.
    * ``label_moves`` (src, dst, batch_id): one row per cluster-merge event —
      when this batch's matches connect existing clusters, every losing root
      re-points to the merged component's min id. Resolution = follow the
      chain (``_apply_moves``); the table holds merge EVENTS only, so it
      stays tiny and the per-batch write is append-shaped.

    Per batch, the merge decision runs on a MINI-GRAPH whose nodes are this
    batch's docs plus the resolved roots of matched clusters — bounded by the
    batch's match volume, never the corpus. Invariant (tested, and oracled by
    q_dup_clusters_incr's recursive CTE): after any prefix of batches, the
    resolved label of every doc equals the min doc id of its connected
    component over ALL matches seen so far — i.e. the promoted view equals a
    batch recluster without ever running one.

    Both writes are (batch_id, ...)-partitioned dynamic overwrite: the per-
    batch content is a deterministic function of strictly-earlier partitions,
    so a re-delivered batch rewrites exactly its own rows (same idempotence
    argument as the signature/flag/index tables)."""
    asg_path, mov_path = cluster_paths(out_root)
    id_type = dict(batch_docs.dtypes)["doc"]
    within = matches.filter(F.col("dup_batch") == bid).select(
        F.col("doc").alias("doc1"), F.col("dup_of").alias("doc2")
    )
    earlier = matches.filter(F.col("dup_batch") < bid).select("doc", "dup_of")
    edges = within
    prior_roots = None
    if _has_parquet(asg_path):
        # One partition-pruned assignment lookup serves both prior-label
        # uses: labels of MATCHED earlier docs (mini-graph root nodes) and
        # labels of RE-CRAWLED batch docs (same id, later batch).
        lookup = (
            batch_docs.unionByName(
                earlier.select(F.col("dup_of").alias("doc"))
            )
            .distinct()
            .withColumn(
                "db", F.pmod(F.xxhash64("doc"), F.lit(n_doc_buckets)).cast("int")
            )
        )
        # bounded driver read: at most n_doc_buckets values
        touched = [r["db"] for r in lookup.select("db").distinct().collect()]
        prior_asg = (
            spark.read.parquet(asg_path)
            .filter((F.col("batch_id") < bid) & F.col("db").isin(touched))
            .select("doc", "label")
        )
        moves = _read_moves(spark, mov_path, id_type, before_batch=bid)
        prior_roots = _apply_moves(
            lookup.select("doc").join(prior_asg, "doc"), moves
        ).localCheckpoint()
        # matched earlier docs link the new doc to their cluster root
        e2 = (
            earlier.join(
                prior_roots.withColumnRenamed("doc", "dup_of"), "dup_of"
            ).select(F.col("doc").alias("doc1"), F.col("label").alias("doc2"))
        )
        # a RE-CRAWLED doc links to its OWN prior root too: if its content
        # changed, its new matches may not include its old cluster, but the
        # doc id itself connects both components in the ground-truth graph —
        # without this edge the promoted view diverges from a batch recluster
        e3 = batch_docs.join(prior_roots, "doc").select(
            F.col("doc").alias("doc1"), F.col("label").alias("doc2")
        )
        edges = within.unionByName(e2).unionByName(e3)
        # FIRST ARRIVAL WINS: the re-crawled doc keeps its original
        # assignment row — a second row would double-count n_members and fan
        # out the compaction join. Its e3/match edges did the merging above.
        # (No checkpoint: asg_new is this frame's only consumer, so the
        # anti-join runs exactly once either way — round 9's per-batch
        # job-count rule.)
        batch_docs = batch_docs.join(
            prior_roots.select("doc"), "doc", "left_anti"
        )
    cc = connected_components(edges).localCheckpoint()
    asg_new = (
        batch_docs.join(cc.select("doc", "cluster"), "doc", "left")
        .select("doc", F.coalesce("cluster", F.col("doc")).alias("label"))
        .withColumn("batch_id", F.lit(bid))
        .withColumn("db", F.pmod(F.xxhash64("doc"), F.lit(n_doc_buckets)).cast("int"))
    )
    def _write_asg():
        (
            asg_new.repartition(n_doc_buckets, "db")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "db")
            .parquet(asg_path)
        )

    def _write_moves():
        if prior_roots is None:
            return
        mv = (
            prior_roots.select(F.col("label").alias("src")).distinct()
            .join(cc, F.col("src") == cc["doc"])
            .filter(F.col("cluster") != F.col("src"))
            .select("src", F.col("cluster").alias("dst"))
            .distinct()
            .withColumn("batch_id", F.lit(bid))
            # the emptiness probe below would otherwise compute the whole
            # merge-detection subtree once and the write would recompute it
            .localCheckpoint()
        )
        if not mv.isEmpty():
            (
                mv.coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(mov_path)
            )

    # independent writes (different stores; both plans read only the
    # checkpointed cc/prior_roots/batch_docs frames) — overlap them; the
    # completion marker below stays strictly AFTER both (its ordering
    # contract), so crash semantics are unchanged
    parallel_actions(_write_asg, _write_moves)
    # Record completion independently of row presence: a batch whose docs ALL
    # had prior assignments (a fully re-crawled batch) writes zero rows, so no
    # batch_id partition dir appears and _cluster_backlog would treat the
    # batch as never-processed — re-triggering a full-prefix replay on every
    # subsequent batch. An (empty) partition dir is the completion marker;
    # Spark's partition discovery ignores file-less dirs, and wiping the
    # assignment table for a replay test removes the markers with it.
    # Ordering matters: the marker goes LAST, after the label_moves write —
    # a fully re-crawled batch can carry a merge (its e2/e3 edges dethrone a
    # root) while writing zero assignment rows, and a marker laid down before
    # that move landed would make a crash in between unreplayable, silently
    # losing the merge.
    os.makedirs(os.path.join(asg_path, f"batch_id={bid}"), exist_ok=True)


def read_cluster_labels(spark: SparkSession, out_root: str,
                        id_type: str = "bigint") -> DataFrame:
    """The promoted "one representative per cluster" view over the online
    cluster log: (doc, cluster, n_members) for every doc in a near-dup
    cluster of size >= 2, cluster = min doc id of the component over all
    matches ingested so far. Semantics identical to a full batch recluster
    (functions.dedup.dup_clusters) — pinned by tests and by the
    q_dup_clusters_incr recursive-CTE oracle."""
    asg_path, mov_path = cluster_paths(out_root)
    if not _has_parquet(asg_path):
        return spark.createDataFrame(
            [], f"doc {id_type}, cluster {id_type}, n_members bigint"
        )
    lab = spark.read.parquet(asg_path).select("doc", "label")
    # the resolved frame feeds BOTH the size rollup and the final join —
    # materialize once so the assignment scan + move join run once
    resolved = _apply_moves(
        lab, _read_moves(spark, mov_path, id_type)
    ).localCheckpoint(eager=False)
    sizes = resolved.groupBy("label").agg(F.count("*").alias("n_members"))
    return (
        resolved.join(sizes, "label")
        .filter(F.col("n_members") > 1)
        .select("doc", F.col("label").alias("cluster"), "n_members")
    )


def compact_cluster_log(spark: SparkSession, out_root: str) -> None:
    """Path compression for the online cluster log: rewrite every assignment
    with its RESOLVED label and clear the move log. ``_apply_moves`` chain
    depth grows one hop each time an old root loses a later merge; compaction
    resets it to zero, so periodic maintenance bounds resolution cost no
    matter how long the stream runs. A full-corpus job by design (one scan +
    one partitioned rewrite) — schedule it like any table-maintenance pass.

    Crash-safe in either order: if the rewrite lands but the move delete
    doesn't, re-applying moves is a no-op (no resolved label is a move src);
    if the rewrite is partial, the surviving moves still resolve the
    untouched partitions. Re-running compaction is idempotent."""
    import shutil

    out_root = require_local(out_root, "streaming-dedup out_root")
    asg_path, mov_path = cluster_paths(out_root)
    if not _has_parquet(asg_path) or not _has_parquet(mov_path):
        return  # nothing to compact (no log, or no merge events yet)
    asg = spark.read.parquet(asg_path)
    id_type = dict(asg.dtypes)["doc"]
    resolved = _apply_moves(
        asg.select("doc", "label"), _read_moves(spark, mov_path, id_type)
    )
    compacted = (
        asg.drop("label")
        .join(resolved, "doc")
        .select("doc", "label", "batch_id", "db")
        # rows never move partitions (batch_id/db depend only on doc), so the
        # dynamic overwrite replaces every partition with its resolved rows
        .localCheckpoint()  # materialize BEFORE overwriting what it reads
    )
    (
        compacted.repartition("db")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "db")
        .parquet(asg_path)
    )
    shutil.rmtree(mov_path)


def make_dedup_batch(spark: SparkSession, out_root: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_hamming: int = 3, n_blocks: int = 4,
                     n_value_buckets: int = N_VALUE_BUCKETS,
                     maintain_clusters: bool = True,
                     n_doc_buckets: int = N_DOC_BUCKETS,
                     sig_fn=None,
                     maintenance_every: int | None = None):
    """foreachBatch body, exposed for direct re-delivery testing.

    ``maintenance_every=K`` runs ``compact_cluster_log`` from inside the
    foreachBatch body after every K-th batch (bid + 1 divisible by K), so
    ``_apply_moves`` chain depth stays bounded (< K extra hops) without
    operator intervention — compaction as a manual-only call let a long
    stream accumulate one hop per dethroned root (round-4 verdict #5).
    Keyed on bid, so a re-delivered batch re-compacts idempotently.

    ``maintain_clusters`` (default on) keeps the online cluster log current
    per batch (``_update_clusters``); ``sig_fn(batch_df, id_col, text_col) ->
    (doc, simhash_hi, simhash_lo)`` overrides the signature kernel — tests
    inject hand-built signatures to pin exact Hamming geometries the text
    kernel cannot be steered to.

    The corpus side of the probe is the BAND INDEX (Manku stores one table
    per band), partitioned by (batch_id, vb = pmod(value, n_value_buckets)):
    a micro-batch lists the <= n_value_buckets vb partitions its own band
    values hash into and the corpus scan partition-prunes to exactly those —
    per-batch read cost tracks |batch| x corpus/n_value_buckets instead of
    the whole signature corpus. Size n_value_buckets ~ the corpus partition
    count at deployment (a small batch then touches a sliver); 16 here keeps
    the sandbox's file count sane."""
    if maintenance_every is not None and maintenance_every < 1:
        raise ValueError(f"maintenance_every must be >= 1, got {maintenance_every}")
    out_root = require_local(out_root, "streaming-dedup out_root")
    sig_path, flag_path, band_path = dedup_paths(out_root)
    geometry = {
        "n_blocks": n_blocks,
        "max_hamming": max_hamming,
        "n_value_buckets": n_value_buckets,
    }
    if sig_fn is not None:
        # an injected signature kernel is part of the on-disk contract
        # (media_dedup.media_sig_fn made it a production route): banding
        # geometry alone would let a resume mix perceptual and text hashes
        # in one index — same key space, incompatible meaning. Tag the
        # scheme by kernel name; the default text simhash64 stays untagged
        # for backward compatibility with existing stores, and any
        # tagged/untagged or cross-name mix refuses loudly in the guard.
        geometry["scheme"] = f"simhash-sig:{getattr(sig_fn, '__name__', 'custom')}"
    if maintain_clusters:
        # the assignment table's db partitioning is part of the on-disk
        # contract too — a bucket-count change would mis-prune label lookups
        geometry["n_doc_buckets"] = n_doc_buckets
    if sig_fn is None:
        sig_fn = simhash64

    def _rebuild_band_index(bid: int) -> None:
        """Signatures exist but the band index doesn't (pre-index layout, or
        a wiped index): rebuild it — the index is a pure derivation of the
        signature table, so resuming with an empty one would silently treat
        the corpus as empty and un-flag every cross-batch duplicate."""
        prior_sigs = spark.read.parquet(sig_path).filter(F.col("batch_id") < bid)
        rebuilt = _bands(prior_sigs, n_blocks, max_hamming).withColumn(
            "vb", F.pmod(F.col("value"), F.lit(n_value_buckets)).cast("int")
        )
        (
            rebuilt.repartition(n_value_buckets, "vb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "vb")
            .parquet(band_path)
        )

    def _rebuild_cluster_log(backlog: list[int]) -> None:
        """The cluster log is behind the signature table (pre-cluster layout,
        a wiped log, or a crashed earlier replay): REPLAY cluster maintenance
        for exactly the missing batches, in order. Unlike the band index (a
        stateless derivation, rebuilt in one pass) the cluster log is
        order-dependent — resuming with an empty or truncated one would
        silently mislabel earlier docs. _update_clusters is idempotent per
        batch, so re-running the possibly-partial boundary batch is safe."""
        all_sigs = (
            spark.read.parquet(sig_path)
            .filter(F.col("batch_id") <= max(backlog))
            .localCheckpoint()
        )
        all_bands = _bands(all_sigs, n_blocks, max_hamming)
        for k in backlog:
            m = _matches_from_bands(
                all_bands.filter(F.col("batch_id") == k),
                all_bands.filter(F.col("batch_id") <= k),
                max_hamming,
            ).localCheckpoint()
            _update_clusters(
                spark, out_root,
                all_sigs.filter(F.col("batch_id") == k).select("doc").distinct(),
                m, k, n_doc_buckets,
            )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if batch_df.isEmpty():
            # nothing to sign, flag, or index — make the no-op explicit
            # instead of relying on isin([])-is-false and empty-frame writes
            return
        _geometry_guard(out_root, geometry)
        if _has_parquet(sig_path) and not _has_parquet(band_path):
            _rebuild_band_index(bid)
        if maintain_clusters:
            backlog = _cluster_backlog(
                sig_path, cluster_paths(out_root)[0], bid
            )
            if backlog:
                _rebuild_cluster_log(backlog)
        # localCheckpoint: the signature kernel output feeds FOUR consumers
        # (touched-bucket probe, both flag-join sides, two writes) and Spark
        # does not reuse exchanges across them — materialize the batch-sized
        # result once instead of re-running the kernel per consumer
        sigs = (
            sig_fn(batch_df, id_col, text_col)
            .withColumn("batch_id", F.lit(bid))
            .localCheckpoint()
        )
        new_bands = _bands(sigs, n_blocks, max_hamming).withColumn(
            "vb", F.pmod(F.col("value"), F.lit(n_value_buckets)).cast("int")
        )
        # bounded driver read: at most n_value_buckets values
        touched = [r["vb"] for r in new_bands.select("vb").distinct().collect()]
        if os.path.exists(band_path):
            prior_bands = (
                spark.read.parquet(band_path)
                .filter((F.col("batch_id") < bid) & F.col("vb").isin(touched))
            )
            corpus_bands = prior_bands.unionByName(new_bands)
        else:
            corpus_bands = new_bands
        # the full match set feeds BOTH the flag view and cluster maintenance
        # — materialize it once (batch-sized)
        matches = _matches_from_bands(
            new_bands, corpus_bands, max_hamming
        ).localCheckpoint()
        flags = _flags_from_matches(matches)
        # The three store writes are INDEPENDENT (each overwrites only its
        # own batch_id=bid partitions; their plans read the checkpointed
        # sigs/matches frames, never each other's store), so they overlap
        # (io.parallel_actions — guide §2.6): each job is commit/file-
        # latency-bound with most cores idle. A crash mid-batch leaves any
        # subset written — exactly as before, re-delivery overwrites all
        # three deterministically. flags may be empty for a batch; the
        # partition column is still recorded via an explicit lit.
        parallel_actions(
            lambda: (
                sigs.coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(sig_path)
            ),
            lambda: (
                new_bands.repartition(n_value_buckets, "vb")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "vb")
                .parquet(band_path)
            ),
            lambda: (
                flags.withColumn("batch_id", F.lit(bid))  # restore post-agg
                .coalesce(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(flag_path)
            ),
        )
        if maintain_clusters:
            _update_clusters(
                spark, out_root, sigs.select("doc").distinct(), matches,
                bid, n_doc_buckets,
            )
            if maintenance_every and (bid + 1) % maintenance_every == 0:
                compact_cluster_log(spark, out_root)

    return process_batch


def make_minhash_dedup_batch(spark: SparkSession, out_root: str,
                             id_col: str = "doc_id", text_col: str = "text",
                             n_bands: int = 4, n_rows: int = 2,
                             n_value_buckets: int = N_VALUE_BUCKETS,
                             maintain_clusters: bool = True,
                             n_doc_buckets: int = N_DOC_BUCKETS,
                             maintenance_every: int | None = None):
    """foreachBatch body for JACCARD-space incremental dedup: the same
    banded-index machinery as the SimHash body, with MinHash (bands x rows)
    band keys (functions.dedup.minhash_band_keys_df) as the signature.

    Differences from the SimHash path, both intrinsic to MinHash-LSH:

    * the per-doc band-key VECTOR is the signature — the band index IS the
      signature table (one table, no separate sig parquet, no band-index
      rebuild path; a wiped CLUSTER log still replays from it);
    * banding is the candidate test (P(collision) = s^r per band for Jaccard
      s): there is no cheap residual verify, so a flag means "collided in
      >= 1 band" and carries ``n_bands_hit`` (collisions across all bands —
      more hits, higher Jaccard confidence) instead of a Hamming distance.
      Run ngram_jaccard_pairs over flagged pairs where exactness matters.

    The 128-bit md5 band key is truncated to its first 15 hex digits as a
    BIGINT ``value`` (the shared index layout): truncation adds ~2^-60 junk
    collisions per pair — far below the banding false-positive rate itself.

    Geometry (scheme, bands, rows, buckets) persists via the same guard;
    an index built by the SimHash body refuses MinHash probes and vice
    versa. Flags/index/cluster writes keep batch-partitioned dynamic
    overwrite, so re-delivery stays idempotent; ``_update_clusters``
    maintains the same online cluster log off the match set."""
    from ..functions.dedup import minhash_band_keys_df

    if maintenance_every is not None and maintenance_every < 1:
        raise ValueError(f"maintenance_every must be >= 1, got {maintenance_every}")
    out_root = require_local(out_root, "streaming-dedup out_root")
    _, flag_path, band_path = dedup_paths(out_root)
    geometry = {
        "scheme": "minhash",
        "n_bands": n_bands,
        "n_rows": n_rows,
        "n_value_buckets": n_value_buckets,
    }
    if maintain_clusters:
        geometry["n_doc_buckets"] = n_doc_buckets

    def _minhash_matches(new_b: DataFrame, corpus_b: DataFrame) -> DataFrame:
        """All band-collision matches with co-matching band counts."""
        n, c = new_b.alias("n"), corpus_b.alias("c")
        earlier = (F.col("c.batch_id") < F.col("n.batch_id")) | (
            (F.col("c.batch_id") == F.col("n.batch_id"))
            & (F.col("c.doc") < F.col("n.doc"))
        )
        return (
            n.join(
                c,
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.value") == F.col("c.value"))
                & earlier,
            )
            .groupBy(
                F.col("n.doc").alias("doc"),
                F.col("n.batch_id").alias("batch_id"),
                F.col("c.doc").alias("dup_of"),
                F.col("c.batch_id").alias("dup_batch"),
            )
            .agg(F.count("*").alias("n_bands_hit"))
        )

    def _rebuild_cluster_log(backlog: list[int]) -> None:
        """The cluster log is behind the band table (the MinHash signature
        table): replay maintenance for exactly the missing batches, as the
        SimHash body does — a truncated log would silently drop earlier docs
        from their clusters. Re-running the boundary batch is idempotent."""
        all_bands = (
            spark.read.parquet(band_path)
            .filter(F.col("batch_id") <= max(backlog))
            .localCheckpoint()
        )
        for k in backlog:
            m = _minhash_matches(
                all_bands.filter(F.col("batch_id") == k),
                all_bands.filter(F.col("batch_id") <= k),
            ).localCheckpoint()
            _update_clusters(
                spark, out_root,
                all_bands.filter(F.col("batch_id") == k).select("doc").distinct(),
                m, k, n_doc_buckets,
            )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if batch_df.isEmpty():
            return
        _geometry_guard(out_root, geometry)
        if maintain_clusters:
            backlog = _cluster_backlog(
                band_path, cluster_paths(out_root)[0], bid
            )
            if backlog:
                _rebuild_cluster_log(backlog)
        new_bands = (
            minhash_band_keys_df(batch_df, id_col, text_col, n_bands, n_rows)
            .select(
                "doc", "band",
                F.conv(F.substring("band_key", 1, 15), 16, 10)
                .cast("bigint").alias("value"),
            )
            .withColumn("batch_id", F.lit(bid))
            .withColumn(
                "vb", F.pmod(F.col("value"), F.lit(n_value_buckets)).cast("int")
            )
            .localCheckpoint()  # feeds probe, join sides, write, clusters
        )
        touched = [r["vb"] for r in new_bands.select("vb").distinct().collect()]
        if _has_parquet(band_path):
            prior = (
                spark.read.parquet(band_path)
                .filter((F.col("batch_id") < bid) & F.col("vb").isin(touched))
            )
            corpus_bands = prior.unionByName(new_bands)
        else:
            corpus_bands = new_bands
        matches = _minhash_matches(new_bands, corpus_bands).localCheckpoint()
        # best match = most co-matching bands, then smallest (dup_of, batch)
        best = F.min(
            F.struct(
                (-F.col("n_bands_hit")).alias("neg"), "dup_of", "dup_batch"
            )
        ).alias("m")
        flags = (
            matches.groupBy("doc", "batch_id")
            .agg(best)
            .select(
                "doc", "batch_id",
                F.col("m.dup_of").alias("dup_of"),
                F.col("m.dup_batch").alias("dup_batch"),
                (-F.col("m.neg")).cast("bigint").alias("n_bands_hit"),
            )
        )
        (
            new_bands.repartition(n_value_buckets, "vb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "vb")
            .parquet(band_path)
        )
        (
            flags.withColumn("batch_id", F.lit(bid))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(flag_path)
        )
        if maintain_clusters:
            _update_clusters(
                spark, out_root,
                new_bands.select("doc").distinct(),
                matches, bid, n_doc_buckets,
            )
            if maintenance_every and (bid + 1) % maintenance_every == 0:
                compact_cluster_log(spark, out_root)

    return process_batch


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    out_root: str,
    checkpoint_dir: str,
    schema=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_hamming: int = 3,
    n_blocks: int = 4,
    maintain_clusters: bool = True,
    scheme: str = "simhash",
    minhash_bands: int = 4,
    minhash_rows: int = 2,
    maintenance_every: int | None = None,
) -> StreamingQuery:
    """Stream document parquet files from ``source_dir``; each micro-batch is
    flagged against the signature corpus accumulated so far (module doc) and
    the online cluster log is kept current (``_update_clusters``).

    ``scheme="simhash"`` (default) flags by Hamming distance over SimHash-64
    signatures (max_hamming / n_blocks dials); ``scheme="minhash"`` flags by
    MinHash band collision in Jaccard space (minhash_bands / minhash_rows
    dials — ``make_minhash_dedup_batch``). The geometry guard keeps one index
    root on one scheme. ``maintenance_every=K`` compacts the cluster log
    every K batches from inside the foreachBatch body (bounded
    ``_apply_moves`` resolution on an arbitrarily long stream)."""
    if scheme == "simhash":
        body = make_dedup_batch(
            spark, out_root, id_col, text_col, max_hamming, n_blocks,
            maintain_clusters=maintain_clusters,
            maintenance_every=maintenance_every,
        )
    elif scheme == "minhash":
        body = make_minhash_dedup_batch(
            spark, out_root, id_col, text_col,
            n_bands=minhash_bands, n_rows=minhash_rows,
            maintain_clusters=maintain_clusters,
            maintenance_every=maintenance_every,
        )
    else:
        raise ValueError(f"unknown dedup scheme {scheme!r}")
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
