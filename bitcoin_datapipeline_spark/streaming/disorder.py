"""Shared bounded-lateness fold discipline for event-keyed stateful
processors (streaming VPIN / Kyle / Roll twins).

A real SBE feed reorders at ms scale.  Every processor that folds trades
into an ORDER-SENSITIVE clock (volume clock, minute buckets, consecutive
Δp pairs) needs the same three rules:

1. events inside the ``allowed_lateness`` window WAIT in a bounded
   pending pool and fold in (event_ts, tiebreak) order once the horizon
   (newest observed ts − lateness) passes them — bounded disorder then
   reproduces the batch twin exactly;
2. events at or behind the FOLDED frontier (the max folded sort key) are
   hard-late: dropped AND counted, never silently folded out of order;
3. with lateness 0 the whole pool folds through the newest event — the
   strictest policy, byte-compatible with an in-order feed.

``merge_fold`` implements all three over opaque event tuples whose first
two fields are the (event_ts, tiebreak) sort key; processors keep the
returned pool/frontier/count in their state rows.
"""

from __future__ import annotations

_NO_FRONTIER = -(1 << 62)


def merge_fold(
    new_events,
    pend: list,
    frontier: tuple[int, int],
    late_ms: int,
):
    """Merge ``new_events`` (iterable of tuples keyed by fields [0:2])
    into the pending pool, drop-and-count hard-late ones, and split off
    the sorted fold list at the lateness horizon.

    Returns ``(fold, pend, frontier, n_late)`` — events to fold now (in
    key order), the remaining pool, the advanced frontier, and how many
    arrivals were behind the old frontier."""
    n_late = 0
    for ev in new_events:
        if (ev[0], ev[1]) <= frontier:
            n_late += 1
        else:
            pend.append(ev)
    if not pend:
        return [], pend, frontier, n_late
    horizon = max(e[0] for e in pend) - late_ms
    pend.sort()
    keep_from = len(pend)
    for i, e in enumerate(pend):
        if e[0] > horizon:
            keep_from = i
            break
    fold, pend = pend[:keep_from], pend[keep_from:]
    if fold:
        frontier = (fold[-1][0], fold[-1][1])
    return fold, pend, frontier, n_late
