"""Streaming SemDeDup — the embedding-ingest near-duplicate gate.

The batch :func:`~..operators.similarity.semdedup` audits a corpus at
rest; a production training-data pipeline ALSO needs the gate at ingest
time: as vectors arrive, decide keep/drop against everything already
admitted, so the curated store never accumulates semantic duplicates —
the embedding-space twin of the text side's incremental-ingest dedup
gate (`sources/dedup_index.py`).

Design (the batch method's 100 TB shape, made live):

- **Assignment is map-side and JVM-side**: the coarse quantizer is
  trained OFFLINE on a static reference corpus (the spark.ml fit()
  pattern — pass the centroids in) and broadcast as the same 1-row
  model frame the batch path uses (`_centroid_frame` /
  `_centroid_scores`), so the stream never shuffles to find its
  cluster and the 6-dp cosine sync with the batch assignment is the
  SAME compiled expression, not a reimplementation.
- **State is cluster-blocked**: `applyInPandasWithState` keyed by the
  cluster id; per-cluster state is the admitted-or-seen vectors of that
  cluster only, so state width is bounded by cluster width (corpus/K),
  exactly the bound that makes the batch pair join tractable — K scales
  with corpus size to hold it (Abbas et al. 2023 use K≈10⁵ at 5 B
  docs).  At 100 TB the state store is RocksDB and the per-cluster
  vector block is the same thing the batch self-join would have hashed.
- **The verdict is the batch verdict**: a vector is dropped iff a
  SMALLER-id vector of its cluster has 6-dp-rounded cosine ≥ threshold,
  `dup_of` = the smallest such id, `n_dup_neighbors` = how many — so a
  stream over a corpus in id order emits EXACTLY the batch audit table
  (property-tested through a real checkpointed availableNow stream).

Exactness discipline: the pair dot product folds dimensions in the
batch `_dot` order (a sequential left fold — vectorized across the
cluster block but dimension-sequential, so every pair's accumulation
order matches `aggregate(zip_with(...))`); norms arrive from the same
JVM `with_norm` expression the batch uses; rounding is the
Spark-identical HALF_UP 6-dp rule (`_round6`), applied only inside the
±1e-6 screening band around the threshold where rounding can change
the verdict.

Ordering contract (same as the text ingest gate): the gate assumes
vec_ids arrive nondecreasing per cluster across micro-batches (an
ingest sequence number); within a micro-batch rows are folded in id
order.  A smaller id arriving after a larger one is still judged only
against ids below it (never against later arrivals), and re-delivery
of an already-seen id is idempotent — the verdict is recomputed, state
is not duplicated (at-least-once source safety).

cf. reference: extends the surface (no embedding ops in the
reference); the keep-rule and blocking discipline mirror the engine's
own batch `semdedup` (operators/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.similarity import (
    SEMDEDUP_THRESHOLD,
    _centroid_frame,
    _centroid_scores,
    with_norm,
)
from .vpin import _round6

SEMDEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("n_dup_neighbors", T.LongType()),
    ]
)

# parallel arrays: admitted ids (int64), row-major flattened embeddings
# (float64 — the widened floats the batch _dot casts), their norms
# (float64) — each carried as an OPAQUE little-endian ndarray blob.
# A cluster block is O(corpus/K) vectors; as a typed array<double> every
# element crosses the state store as a boxed value per micro-batch, and
# at hot-cell widths that ser/de round trip rivaled the pair math
# itself (measured ~4 s/run at an 18 k-wide cell).  tobytes()/frombuffer
# is a memcpy.  Same-architecture contract (checkpoints are not
# portable across endianness), standard for binary-blob state.
SEMDEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.BinaryType()),
        T.StructField("flat", T.BinaryType()),
        T.StructField("norms", T.BinaryType()),
    ]
)

_OUT_COLS = [f.name for f in SEMDEDUP_OUTPUT_SCHEMA.fields]


def _pair_cosines(block: np.ndarray, norms: np.ndarray, emb: np.ndarray,
                  norm: float) -> np.ndarray:
    """Raw cosines of ``emb`` against every row of ``block``, folding
    dimensions SEQUENTIALLY (t = 0..d-1) so each pair's accumulation
    order equals the batch ``aggregate(zip_with(...))`` left fold —
    vectorized across rows, ordered across dims."""
    acc = np.zeros(len(block), dtype=np.float64)
    for t in range(block.shape[1]):
        acc += block[:, t] * emb[t]
    return acc / (norms * norm)


_CHUNK_BYTES = 64 << 20  # similarity-matrix chunk budget per key per batch


def make_semdedup_processor(threshold: float = SEMDEDUP_THRESHOLD):
    """Per-cluster ingest gate (see module docstring for the contract).

    Fully vectorized: the keep rule judges every arrival only against
    SMALLER ids among everything seen — it never depends on other
    arrivals' verdicts (state retains all seen vectors) — so one batch
    is one chunked ``arrivals @ seenᵀ`` matrix product with a strict
    triangular id mask, not a per-arrival loop.  A hot cell (the dup
    storm: 90 % of a tape in one quantizer cell) therefore pays BLAS
    throughput on its one serialized state partition instead of
    len(batch) gemv calls — measured 5.08× → 1.83× vs the balanced
    tape at sf1 (tools/bench_semdedup_skew.py; with the binary-blob
    state below — the residual ratio is the structural one-partition
    floor).  BLAS accumulation order
    differs from the batch ``aggregate(zip_with)`` left fold by well
    under 1e-12 at these dims, so outside the ±1e-6 screening band the
    raw compare is order-insensitive; pairs INSIDE the band are
    recomputed with the sequential dimension fold before the
    Spark-identical rounding — bit-exact batch equality preserved."""

    def fn(key, pdfs, state: GroupState):
        cluster = int(key[0])
        chunks = [pdf[["vec_id", "embedding", "norm"]]
                  for pdf in pdfs if len(pdf)]
        if not chunks:
            yield pd.DataFrame([], columns=_OUT_COLS)
            return
        ev = pd.concat(chunks, ignore_index=True).sort_values(
            "vec_id", kind="mergesort"
        )

        d = len(ev["embedding"].iloc[0])
        # state → ONE ndarray conversion per batch (converting inside a
        # per-vector loop is O(width²·d) list→float work per batch)
        if state.exists:
            ids0, flat0, norms0 = state.get
            base = np.frombuffer(flat0, dtype="<f8").reshape(-1, d)
            base_ids = np.frombuffer(ids0, dtype="<i8")
            base_norms = np.frombuffer(norms0, dtype="<f8")
        else:
            base = np.empty((0, d), dtype=np.float64)
            base_ids = np.empty(0, dtype=np.int64)
            base_norms = np.empty(0, dtype=np.float64)

        ev_ids = ev["vec_id"].to_numpy(dtype=np.int64)
        ev_norms = ev["norm"].to_numpy(dtype=np.float64)
        ev_m = np.array(list(ev["embedding"]), dtype=np.float64).reshape(
            len(ev), d
        )

        # vectors this batch ADDS to state: first occurrence of each id
        # not already seen (re-delivery stays idempotent — judged again,
        # never re-admitted)
        first = ~pd.Series(ev_ids).duplicated().to_numpy()
        unseen = ~np.isin(ev_ids, base_ids)
        add = first & unseen
        comb = np.concatenate([base, ev_m[add]])
        comb_ids = np.concatenate([base_ids, ev_ids[add]])
        comb_norms = np.concatenate([base_norms, ev_norms[add]])

        m = len(ev)
        n_dup = np.zeros(m, dtype=np.int64)
        dup_of = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
        if len(comb):
            # pre-normalized operands: one matmul per chunk instead of
            # matmul + m×w outer-divide (the normalization reassociation
            # is ~1e-16 relative — far inside the screening band)
            ev_u = ev_m / ev_norms[:, None]
            comb_u = (comb / comb_norms[:, None]).T
            # under the in-order arrival contract comb_ids is ascending,
            # so the smallest hit id is the FIRST hit column (argmax on
            # bool) — checked per batch; out-of-contract tapes fall back
            # to the where/min path
            ids_sorted = bool(np.all(np.diff(comb_ids) >= 0))
            chunk = max(1, _CHUNK_BYTES // (8 * len(comb)))
            for s in range(0, m, chunk):
                e = min(s + chunk, m)
                raw = ev_u[s:e] @ comb_u
                # only smaller ids can claim a vector (batch rule); the
                # strict mask also silences self-pairs
                elig = comb_ids[None, :] < ev_ids[s:e, None]
                hit = (raw >= threshold + 1e-6) & elig
                # screening band: rounding to 6 dp moves a value by at
                # most 5e-7, so outside ±1e-6 the raw compare decides;
                # inside the band recompute the sequential fold and
                # apply the Spark-identical rounding
                near = (np.abs(raw - threshold) < 1e-6) & elig & ~hit
                for i, j in zip(*np.nonzero(near)):
                    seq = _pair_cosines(
                        comb[j: j + 1],
                        comb_norms[j: j + 1],
                        ev_m[s + i],
                        float(ev_norms[s + i]),
                    )[0]
                    if _round6(float(seq)) >= threshold:
                        hit[i, j] = True
                n_dup[s:e] = hit.sum(axis=1)
                if ids_sorted:
                    dup_of[s:e] = comb_ids[hit.argmax(axis=1)]
                else:
                    ids_if_hit = np.where(
                        hit, comb_ids[None, :], np.iinfo(np.int64).max
                    )
                    dup_of[s:e] = ids_if_hit.min(axis=1)

        has_dup = n_dup > 0
        out = pd.DataFrame(
            {
                "vec_id": ev_ids,
                "cluster": np.full(m, cluster, dtype=np.int32),
                "keep": ~has_dup,
                "dup_of": pd.array(
                    np.where(has_dup, dup_of, 0), dtype="Int64"
                ),
                "n_dup_neighbors": n_dup,
            }
        )
        out.loc[~has_dup, "dup_of"] = pd.NA

        state.update(
            (
                comb_ids.astype("<i8").tobytes(),
                comb.astype("<f8").tobytes(),
                comb_norms.astype("<f8").tobytes(),
            )
        )
        yield out

    return fn


def stream_semdedup(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = SEMDEDUP_THRESHOLD,
) -> DataFrame:
    """Live semantic-dedup ingest gate: one verdict row per arriving
    vector (`vec_id, cluster, keep, dup_of, n_dup_neighbors`), equal to
    the batch :func:`~..operators.similarity.semdedup` audit row when
    ids arrive in order (property-tested through a real checkpointed
    stream).  ``vectors`` carries (vec_id long, embedding array<float>);
    ``centroids`` is the offline-trained coarse quantizer
    (`similarity._train_quantizer` output — the spark.ml "fit then
    serve" split)."""
    e = with_norm(vectors)
    # the model frame is stream-static: without a cache the 1-row
    # collect_list aggregate re-executes every micro-batch (measured
    # ~30 % of steady-state batch time); cached eagerly it is built once
    # at stream construction — the fit-then-serve split made literal.
    # K×dims doubles, so the pinned footprint is a few hundred KB even
    # at production K; the stream owns it for its lifetime.
    model = _centroid_frame(vectors.sparkSession, centroids).cache()
    model.count()
    e = e.join(F.broadcast(model))
    best = F.array_max(_centroid_scores())
    assigned = e.select(
        "vec_id",
        (-best["negc"]).cast("long").alias("c"),
        "embedding",
        "norm",
    )
    return assigned.groupBy("c").applyInPandasWithState(
        make_semdedup_processor(threshold),
        outputStructType=SEMDEDUP_OUTPUT_SCHEMA,
        stateStructType=SEMDEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
