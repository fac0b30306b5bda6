"""Exact distributed quantiles (linear interpolation) at scale.

``F.percentile`` is exact but buffers EVERY value into a single
aggregation buffer that is merged onto one reducer — fine at 600k
rows, an OOM at 100 TB. This module computes the same exact result
with bounded memory:

1. one aggregate pass: total count + an ``approx_percentile`` bracket
   around each target rank (the sketch is only used to *locate*, never
   to *answer*);
2. one pass: rank of each bracket's lower bound (count of values
   below) + the bracketed values themselves (a tiny, validated slice);
3. driver-side: select the two exact order statistics around the
   target rank and linearly interpolate — identical semantics to
   ``percentile`` / pandas / DuckDB ``quantile_cont``.

If a bracket is too tight (the sketch erred more than its accuracy
bound) or too wide (slice above ``max_slice`` rows), the bracket is
widened / the accuracy raised and the pass retried — exactness never
depends on the sketch.

Cost: 2 full scans (vs 1 for the buffering version) but O(slice)
memory; both scans are embarrassingly parallel map+partial-agg jobs.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: max rows a bracket slice may hold before we consider it too wide.
DEFAULT_MAX_SLICE = 1_000_000

#: input-size ceiling (bytes) below which the single-buffer
#: ``F.percentile`` aggregate is considered safe. Overridable via the
#: SPARK_GRAFT_PCT_BUFFER_MAX_BYTES env var (0 forces the bounded path
#: — what the scale test does).
BUFFERING_PERCENTILE_MAX_BYTES = 1 << 30


def buffering_percentile_safe(df: DataFrame, *, max_bytes: int | None = None) -> bool:
    """True iff the single-buffer exact ``F.percentile`` aggregate is
    safe for this input.

    Driver-side file-size estimate over ``df.inputFiles()`` — no Spark
    job. Conservative by construction: any input whose size can't be
    established locally (object-store URIs, non-file sources) routes to
    the bounded-memory bracket+refine path, which is the correct
    default at 100 TB anyway."""
    if max_bytes is None:
        # A malformed env value must not raise out of query planning —
        # fall back to the conservative default ceiling instead.
        try:
            max_bytes = int(
                os.environ.get(
                    "SPARK_GRAFT_PCT_BUFFER_MAX_BYTES", BUFFERING_PERCENTILE_MAX_BYTES
                )
            )
        except (TypeError, ValueError):
            max_bytes = BUFFERING_PERCENTILE_MAX_BYTES
    try:
        files = df.inputFiles()
    except Exception:
        return False
    if not files:
        # No file-backed lineage (in-memory / non-file source): size
        # can't be established — route to the bounded path.
        return False
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            parsed = urlparse(uri)
            if parsed.netloc not in ("", "localhost"):
                return False  # remote file URI — can't size locally
            path = unquote(parsed.path)
        elif "://" in uri:
            return False  # object-store URI — can't size locally
        else:
            path = uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return False
        if total > max_bytes:
            return False
    return True


#: histogram fan-out per refinement level of
#: ``exact_percentiles_intkey`` — 2^16 cells collapse a 64-bit value
#: range in <= 4 levels while each level's collected histogram stays
#: <= ~65k two-int rows per pending range.
INTKEY_BUCKETS = 1 << 16

#: Spark integral simpleString() names accepted by the intkey path.
_INT_TYPES = frozenset({"tinyint", "smallint", "int", "bigint"})


def exact_percentiles_intkey(
    df: DataFrame,
    col: str,
    qs: list[float],
    *,
    n_buckets: int = INTKEY_BUCKETS,
) -> list[float | None]:
    """Exact linear-interpolation percentiles of an INTEGRAL column by
    fixed-width histogram selection — no per-value buffer anywhere.

    The sketch-free sibling of :func:`exact_percentiles` for integer
    keys (guide §2.3 "shuffle fewer bytes" + §5 bounded memory): each
    refinement level buckets the candidate value range into
    ``n_buckets`` fixed-width cells with ONE map-side-combinable
    ``groupBy().count()`` — the shuffle carries <= ``n_buckets``
    (cell, count) rows, never values — the driver walks the histogram
    to locate the cell holding each needed order statistic, and the
    next level re-buckets only those cells (all pending ranges share
    one scan via a CASE router). A level whose cell width reaches 1
    IS the (value, count) census, so the order statistics are read
    off directly. A 64-bit range collapses in <= 4 levels: the whole
    computation is <= 5 embarrassingly-parallel count scans with
    O(n_buckets) driver memory — the exact-percentile plan that
    survives any scale, and locally ~2x cheaper than the buffering
    ``F.percentile`` aggregate (each pass is a plain count shuffle;
    nothing sorts or holds the column).

    Interpolation mirrors Spark's ``Percentile.getPercentile`` double
    arithmetic term for term ((higher-pos)*v_lo + (pos-lower)*v_hi at
    pos = (n-1)*q), so results are bit-identical to ``F.percentile``
    (pinned by tests/test_quantiles.py against random columns).

    NULLs are excluded, matching ``F.percentile``. Raises on a
    non-integral column dtype — route doubles to
    :func:`exact_percentiles`.
    """
    if not qs:
        return []
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"percentages must be within [0, 1], got {qs}")
    dt = df.schema[col].dataType.simpleString()
    if dt not in _INT_TYPES:
        raise ValueError(
            f"exact_percentiles_intkey needs an integral column, got "
            f"{col!r}: {dt} — use exact_percentiles for continuous keys"
        )
    c = F.col(col)
    first = df.agg(
        F.count(c).alias("n"), F.min(c).alias("lo"), F.max(c).alias("hi")
    ).collect()[0]
    n = int(first.n)
    if n == 0:
        return [None] * len(qs)
    vmin, vmax = int(first.lo), int(first.hi)
    if vmax - vmin >= (1 << 63) - 1:
        # `c - vmin` could wrap int64 (non-ANSI arithmetic wraps
        # silently -> wrong cells); a column spanning the whole signed
        # range is a hash, not a measurement — refuse loudly.
        raise ValueError(
            f"exact_percentiles_intkey: value range [{vmin}, {vmax}] "
            "spans >= 2^63; rebase the column or use exact_percentiles"
        )
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    positions = [(n - 1) * float(q) for q in qs]
    ks = sorted(
        {int(math.floor(p)) for p in positions}
        | {int(math.ceil(p)) for p in positions}
    )
    # per unresolved order statistic k: candidate value range
    # [lo, hi] and the exact count of values below lo.
    state: dict[int, tuple[int, int, int]] = {k: (vmin, vmax, 0) for k in ks}
    values: dict[int, int] = {}
    # each level divides every pending range's width by n_buckets, so
    # this many levels provably reach width 1 (+2 slack, a hard stop)
    max_levels = (
        math.ceil(math.log(max(vmax - vmin, 1) + 1) / math.log(n_buckets)) + 2
    )
    for _level in range(max_levels):
        pend: dict[tuple[int, int], list[int]] = {}
        for k in ks:
            if k in values:
                continue
            lo, hi, _below = state[k]
            if lo == hi:
                values[k] = lo  # singleton range: resolved scan-free
            else:
                pend.setdefault((lo, hi), []).append(k)
        if not pend:
            break
        ranges = sorted(pend)
        widths = [
            max(1, -(-(hi - lo + 1) // n_buckets)) for lo, hi in ranges
        ]
        marks = None
        for i, ((lo, hi), w) in enumerate(zip(ranges, widths)):
            cond = (c >= F.lit(lo)) & (c <= F.lit(hi))
            # integer DIV keeps cell math exact on the full int64
            # domain (a double round-trip is lossy past 2^53).
            cell = F.expr(f"(`{col}` - {lo}L) DIV {w}L")
            branch = F.struct(F.lit(i).alias("rid"), cell.alias("cell"))
            marks = F.when(cond, branch) if marks is None else marks.when(cond, branch)
        hist = (
            df.select(marks.alias("m"))
            .where(F.col("m").isNotNull())
            .groupBy("m")
            .count()
            .collect()
        )
        per_range: dict[int, list[tuple[int, int]]] = {}
        for row in hist:
            per_range.setdefault(row.m.rid, []).append(
                (int(row.m.cell), int(row["count"]))
            )
        for i, ((lo, hi), w) in enumerate(zip(ranges, widths)):
            ks_here = sorted(pend[(lo, hi)])
            belows = {state[k][2] for k in ks_here}
            if len(belows) != 1:  # same range => same below, by induction
                raise RuntimeError(
                    "exact_percentiles_intkey: inconsistent below-counts "
                    f"for shared range {lo}..{hi}: {sorted(belows)}"
                )
            cum = belows.pop()
            idx = 0
            for cell, cnt in sorted(per_range.get(i, [])):
                lo_v = lo + cell * w
                hi_v = min(hi, lo_v + w - 1)
                while idx < len(ks_here) and cum <= ks_here[idx] < cum + cnt:
                    k = ks_here[idx]
                    if w == 1:
                        values[k] = lo_v
                    else:
                        state[k] = (lo_v, hi_v, cum)
                    idx += 1
                cum += cnt
            if idx != len(ks_here):
                raise RuntimeError(
                    "exact_percentiles_intkey: histogram walk lost order "
                    f"statistics {ks_here[idx:]} in range {lo}..{hi} "
                    "(counts changed between passes?)"
                )
    missing = [k for k in ks if k not in values]
    if missing:
        raise RuntimeError(
            f"exact_percentiles_intkey: unresolved order statistics "
            f"{missing} after refinement limit"
        )
    out: list[float | None] = []
    for pos in positions:
        lo_k = int(math.floor(pos))
        hi_k = int(math.ceil(pos))
        v_lo = float(values[lo_k])
        if hi_k == lo_k:
            out.append(v_lo)
        else:
            # exactly Percentile.getPercentile's expression, in the
            # same evaluation order (Python floats are IEEE doubles).
            out.append((hi_k - pos) * v_lo + (pos - lo_k) * float(values[hi_k]))
    return out


def exact_percentiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    *,
    accuracy: int = 10_000,
    max_slice: int = DEFAULT_MAX_SLICE,
    _max_retries: int = 4,
) -> list[float | None]:
    """Exact linear-interpolation percentiles of ``df[col]``.

    Returns one value per q in ``qs`` (None on an empty column).
    """
    c = F.col(col)
    eps_q = 1.0 / accuracy

    for attempt in range(_max_retries):
        # Pass 1: count + sketch brackets (one aggregate, one job).
        lo_qs = [max(0.0, q - eps_q) for q in qs]
        hi_qs = [min(1.0, q + eps_q) for q in qs]
        first = df.agg(
            F.count(c).alias("n"),
            F.approx_percentile(c, F.array(*[F.lit(q) for q in lo_qs]), F.lit(accuracy)).alias("lo"),
            F.approx_percentile(c, F.array(*[F.lit(q) for q in hi_qs]), F.lit(accuracy)).alias("hi"),
        ).collect()[0]
        n = first.n
        if n == 0:
            return [None] * len(qs)
        if n <= max_slice:
            # Small column: the buffering exact aggregate is cheaper.
            row = df.agg(
                F.percentile(c, F.array(*[F.lit(q) for q in qs])).alias("p")
            ).collect()[0]
            return list(row.p)

        los, his = list(first.lo), list(first.hi)

        # Pass 2a: exact rank of each lower bound + bracket SIZES only.
        # Sizes are validated engine-side BEFORE any collect_list, so an
        # oversized bracket (sketch error at large n) is rejected as a
        # scalar count instead of being materialized on the driver.
        size_aggs = []
        for i, (lo, hi) in enumerate(zip(los, his)):
            size_aggs.append(F.sum(F.when(c < lo, 1).otherwise(0)).alias(f"below{i}"))
            size_aggs.append(
                F.sum(F.when((c >= lo) & (c <= hi), 1).otherwise(0)).alias(f"size{i}")
            )
        second = df.agg(*size_aggs).collect()[0]
        if any((second[f"size{i}"] or 0) > max_slice for i in range(len(qs))):
            accuracy *= 4  # bracket too wide — raise accuracy, retry
            eps_q = 1.0 / accuracy
            continue

        # Pass 2b: the brackets are proven small — now collect them.
        slice_aggs = [
            F.sort_array(
                F.collect_list(F.when((c >= lo) & (c <= hi), c))
            ).alias(f"slice{i}")
            for i, (lo, hi) in enumerate(zip(los, his))
        ]
        third = df.agg(*slice_aggs).collect()[0]

        out: list[float | None] = []
        ok = True
        for i, q in enumerate(qs):
            below = second[f"below{i}"] or 0
            values = third[f"slice{i}"]
            k = (n - 1) * q  # target rank, 0-based fractional
            k_lo, k_hi = math.floor(k), math.ceil(k)
            # Order statistics k_lo/k_hi must sit inside the slice:
            if not (below <= k_lo and k_hi < below + len(values)):
                ok = False  # sketch erred past its bound — widen, retry
                break
            v_lo = values[k_lo - below]
            v_hi = values[k_hi - below]
            out.append(v_lo + (k - k_lo) * (v_hi - v_lo) if k_hi != k_lo else v_lo)
        if ok:
            return out
        accuracy *= 4
        eps_q = 1.0 / accuracy
    raise RuntimeError(
        f"exact_percentiles failed to bracket {qs} on {col!r} after {_max_retries} retries"
    )


def exact_nearest_rank(
    df: DataFrame,
    col: str,
    ranks: list[int],
    *,
    n: int | None = None,
    accuracy: int = 10_000,
    max_slice: int = DEFAULT_MAX_SLICE,
    _max_retries: int = 4,
) -> list:
    """Exact nearest-rank (Type-1) order statistics of ``df[col]``.

    ``ranks`` are 1-based target ranks (rank 1 = min, rank n = max);
    returns the value at each rank, in order. Unlike
    ``exact_percentiles`` there is NO interpolation — the result is an
    actual element of the column — so the answer is bit-identical to a
    ``ROW_NUMBER() = rank`` pick on any engine, with none of the
    last-ulp FP-interpolation divergence risk and none of the global
    sort: the same bracket+refine discipline (sketch locates, never
    answers; brackets validated by size engine-side before any
    collect) at O(slice) memory and 2-3 embarrassingly parallel scans.

    ``n`` (the column count) may be passed when the caller already has
    it from a prior aggregate (saves the count pass).
    """
    c = F.col(col)
    if n is None:
        n = df.agg(F.count(c).alias("n")).collect()[0].n
    if n == 0:
        return [None] * len(ranks)
    if any(r < 1 or r > n for r in ranks):
        raise ValueError(f"ranks {ranks} out of bounds for n={n}")
    if n <= max_slice:
        # Small column: one sorted buffer answers every rank. The rank
        # pick happens ENGINE-side (element_at on the agg buffer) so
        # only len(ranks) scalars ever cross to the driver — the
        # collect stays panel-sized even when the column is ~max_slice.
        row = (
            df.agg(F.sort_array(F.collect_list(c)).alias("s"))
            .select(
                F.array(
                    *[F.element_at("s", int(r)) for r in ranks]
                ).alias("p")
            )
            .collect()[0]
        )
        return list(row.p)

    # Bracket each rank as a quantile interval around (r-1)/(n-1);
    # FP error in the ratio only widens/narrows the LOCATING bracket,
    # never the answer (the exact rank is re-derived from the exact
    # `below` count inside the slice).
    eps_q = 1.0 / accuracy
    for _ in range(_max_retries):
        lo_qs = [max(0.0, (r - 1) / (n - 1) - eps_q) if n > 1 else 0.0 for r in ranks]
        hi_qs = [min(1.0, (r - 1) / (n - 1) + eps_q) if n > 1 else 1.0 for r in ranks]
        first = df.agg(
            F.approx_percentile(
                c, F.array(*[F.lit(q) for q in lo_qs]), F.lit(accuracy)
            ).alias("lo"),
            F.approx_percentile(
                c, F.array(*[F.lit(q) for q in hi_qs]), F.lit(accuracy)
            ).alias("hi"),
        ).collect()[0]
        los, his = list(first.lo), list(first.hi)

        size_aggs = []
        for i, (lo, hi) in enumerate(zip(los, his)):
            size_aggs.append(F.sum(F.when(c < lo, 1).otherwise(0)).alias(f"below{i}"))
            size_aggs.append(
                F.sum(F.when((c >= lo) & (c <= hi), 1).otherwise(0)).alias(f"size{i}")
            )
        second = df.agg(*size_aggs).collect()[0]
        if any((second[f"size{i}"] or 0) > max_slice for i in range(len(ranks))):
            accuracy *= 4
            eps_q = 1.0 / accuracy
            continue

        # Pass 2b: brackets proven small — pick each order statistic
        # ENGINE-side (element_at against the sorted slice buffer), so
        # only len(ranks) scalars reach the driver, never a slice.
        ok = True
        pick_aggs = []
        for i, (r, lo, hi) in enumerate(zip(ranks, los, his)):
            below = second[f"below{i}"] or 0
            size = second[f"size{i}"] or 0
            k = r - 1  # 0-based exact integer order statistic
            if not (below <= k < below + size):
                ok = False  # sketch erred past its bound — widen, retry
                break
            pick_aggs.append(
                F.element_at(
                    F.sort_array(
                        F.collect_list(F.when((c >= lo) & (c <= hi), c))
                    ),
                    int(k - below + 1),
                ).alias(f"v{i}")
            )
        if ok:
            third = df.agg(*pick_aggs).collect()[0]
            return [third[f"v{i}"] for i in range(len(ranks))]
        accuracy *= 4
        eps_q = 1.0 / accuracy
    raise RuntimeError(
        f"exact_nearest_rank failed to bracket ranks {ranks} on {col!r}"
        f" after {_max_retries} retries"
    )
