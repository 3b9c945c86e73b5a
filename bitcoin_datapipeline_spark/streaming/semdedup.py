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

# parallel arrays: admitted ids, row-major flattened embeddings (as
# doubles — the widened floats the batch _dot casts), their norms
SEMDEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("flat", T.ArrayType(T.DoubleType())),
        T.StructField("norms", T.ArrayType(T.DoubleType())),
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


def make_semdedup_processor(threshold: float = SEMDEDUP_THRESHOLD):
    """Per-cluster ingest gate (see module docstring for the contract)."""

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
        # state → ONE ndarray conversion per batch (converting inside the
        # per-vector loop is O(width²·d) list→float work per batch — the
        # difference between a flat and a quadratic per-key cost as the
        # admitted block grows); batch-local admissions append into a
        # preallocated buffer, so the loop never re-materializes a list
        if state.exists:
            ids0, flat0, norms0 = state.get
            base = np.asarray(flat0, dtype=np.float64).reshape(-1, d)
            base_ids = np.asarray(ids0, dtype=np.int64)
            base_norms = np.asarray(norms0, dtype=np.float64)
        else:
            base = np.empty((0, d), dtype=np.float64)
            base_ids = np.empty(0, dtype=np.int64)
            base_norms = np.empty(0, dtype=np.float64)
        seen = set(base_ids.tolist())
        nb = 0  # admitted THIS batch, filling the preallocated tail
        new_block = np.empty((len(ev), d), dtype=np.float64)
        new_ids = np.empty(len(ev), dtype=np.int64)
        new_norms = np.empty(len(ev), dtype=np.float64)

        def judge(raw: np.ndarray, id_arr: np.ndarray, vec_id: int):
            # only smaller ids can claim this vector (batch rule);
            # screening band: rounding to 6 dp moves a value by at most
            # 5e-7, so outside ±1e-6 the raw compare decides; inside the
            # band use the Spark-identical rounding
            eligible = id_arr < vec_id
            hit = (raw >= threshold + 1e-6) & eligible
            near = (np.abs(raw - threshold) < 1e-6) & eligible & ~hit
            for j in np.nonzero(near)[0]:
                if _round6(float(raw[j])) >= threshold:
                    hit[j] = True
            return hit

        rows = []
        for vec_id, emb_raw, norm in zip(
            ev["vec_id"], ev["embedding"], ev["norm"]
        ):
            vec_id = int(vec_id)
            norm = float(norm)
            emb = np.asarray(emb_raw, dtype=np.float64)
            dup_of = None
            n_dup = 0
            if len(base):
                hit = judge(
                    _pair_cosines(base, base_norms, emb, norm),
                    base_ids,
                    vec_id,
                )
                n_dup = int(hit.sum())
                if n_dup:
                    dup_of = int(base_ids[hit].min())
            if nb:
                hit = judge(
                    _pair_cosines(
                        new_block[:nb], new_norms[:nb], emb, norm
                    ),
                    new_ids[:nb],
                    vec_id,
                )
                if hit.any():
                    n_dup += int(hit.sum())
                    cand = int(new_ids[:nb][hit].min())
                    dup_of = cand if dup_of is None else min(dup_of, cand)
            rows.append(
                (vec_id, cluster, dup_of is None, dup_of, n_dup)
            )
            if vec_id not in seen:  # re-delivery stays idempotent
                seen.add(vec_id)
                new_block[nb] = emb
                new_ids[nb] = vec_id
                new_norms[nb] = norm
                nb += 1

        state.update(
            (
                base_ids.tolist() + new_ids[:nb].tolist(),
                np.concatenate(
                    [base.ravel(), new_block[:nb].ravel()]
                ).tolist(),
                base_norms.tolist() + new_norms[:nb].tolist(),
            )
        )
        yield pd.DataFrame(rows, columns=_OUT_COLS)

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
