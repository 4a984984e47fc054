#!/usr/bin/env python
"""One-off DEEP differential fuzz vs the reference Java engine: the same
generator/harness as tests/test_fuzz_java.py (one JVM batch + isolated
re-match for the reference's own join-churn indeterminism) at several
times the CI case count, under fresh seeds. Run occasionally to
re-stress the bit-match contract; prints one JSON summary line.

Usage: python tools/deep_fuzz.py [--grouped 300] [--single 100] [--seed 77]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

from modelardb_dynamic_spark.config import EngineConfig  # noqa: E402


def reference_tail_drop_equivalent(got, exp, si: int, n_members=None) -> bool:
    """True iff the ONLY divergence is the reference's known end-of-
    stream split data loss (TimeSeriesGroup.java:72-89: the split
    constructor recomputes timeSeriesHasNext from the underlying
    iterators while the final prefetched tick still sits unemitted in
    nextDataPoints, so a split landing with the last tick prefetched
    makes the child report hasNext()==false and drop that tick).

    Acceptance, two shapes of the same loss:
    1. every expected-only segment pairs with a got-only segment that
       has the same start_ts and gaps, covers exactly ONE more data
       point, and ends exactly one sampling interval later — ours is
       the reference segment plus the tick the reference dropped;
    2. (seed 20260821 case 105) the dropped tick would have BEGUN a
       new segment — the reference emits nothing for it, so a got-only
       SINGLETON (cnt 1, start==end) remains with no expected-only
       counterpart. Accepted only when, for every member that
       singleton covers, the reference stream's coverage ends exactly
       one sampling interval before it (needs n_members to resolve the
       1-based gaps complement).
    Everything else must match exactly.
    """
    sg, se = set(got), set(exp)
    only_got = sorted(sg - se)
    only_exp = sorted(se - sg)
    if not only_got or len(only_got) < len(only_exp):
        return False
    unmatched = list(only_got)
    for e in only_exp:
        est, eet, _emtid, ecnt, _emodel, egaps = e
        hit = None
        for g in unmatched:
            gst, get_, _gmtid, gcnt, _gmodel, ggaps = g
            if (
                gst == est
                and ggaps == egaps
                and gcnt == ecnt + 1
                and get_ == eet + si
            ):
                hit = g
                break
        if hit is None:
            return False
        unmatched.remove(hit)
    if unmatched and n_members is None:
        return False
    for g in unmatched:
        gst, get_, _gmtid, gcnt, _gmodel, ggaps = g
        if gcnt != 1 or gst != get_:
            return False
        for m in range(1, n_members + 1):
            if m in ggaps:
                continue
            cover_end = max(
                (eet for (_est, eet, _mt, _c, _mo, egaps) in exp
                 if m not in egaps),
                default=None,
            )
            if cover_end != gst - si:
                return False
    return True


def reference_envelope_match(
    FJ, case, got, workdir, ci, keep_kind=False
) -> bool:
    """True iff the reference ITSELF produces our exact stream under a
    different JVM heap state. The reference drains its pending-join set
    via HashSet iteration over identity hashes
    (SegmentGenerator.java:445), and join MEMBERSHIP — not just
    emission order — depends on which candidate pops first when
    pairwise correlation is not transitive; so the same input yields
    different (all individually valid) segment streams run to run.
    We re-run the case preceded by 1..4 copies of itself (perturbing
    identity-hash allocation) and accept if ANY run equals ours
    byte-for-byte."""
    from pathlib import Path

    for k in range(1, 5):
        d = Path(workdir) / f"env{ci}_{k}"
        d.mkdir()
        exp = FJ._java_expected(
            [case] * k + [case], d, keep_kind=keep_kind
        )[-1]
        if sorted(exp) == got:
            return True
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grouped", type=int, default=300)
    ap.add_argument("--single", type=int, default=100)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--latency", type=int, default=0,
                    help="additionally run N maximum_latency cases "
                         "(interleaved temporary + finalized streams)")
    args = ap.parse_args()

    import test_fuzz_java as FJ
    from modelardb_dynamic_spark.models.grouped import compress_group
    from modelardb_dynamic_spark.models.kernels import compress_series

    out = {"seed": args.seed, "mismatches": 0, "isolated_rechecks": 0}
    with tempfile.TemporaryDirectory(prefix="mdbs_deepfuzz_") as d:
        tmp = Path(d)
        for kind, n_cases in (("grouped", args.grouped),
                              ("single", args.single)):
            rng = np.random.default_rng(args.seed + (0 if kind == "grouped" else 1))
            cases = [
                FJ._gen_case(rng, force_g1=(kind == "single"))
                for _ in range(n_cases)
            ]
            kdir = tmp / kind
            kdir.mkdir()
            expected = FJ._java_expected(cases, kdir)
            for ci, (series, eb, sf) in enumerate(cases):
                cfg = EngineConfig(
                    error_bound=eb, length_bound=FJ.LB,
                    sampling_interval_ms=FJ.SI,
                )
                if kind == "grouped":
                    ts, V, _ = FJ._group_matrix(series)
                    segs = compress_group(ts, V, cfg, split_fraction=sf)
                    got = sorted(
                        (s.start_ts, s.end_ts, s.mtid, s.cnt,
                         s.model.hex(), s.gaps)
                        for s in segs
                    )
                    if got != sorted(expected[ci]):
                        if reference_tail_drop_equivalent(
                            got, expected[ci], FJ.SI,
                            n_members=len(series),
                        ):
                            out["ref_tail_drops"] = (
                                out.get("ref_tail_drops", 0) + 1
                            )
                            continue
                        out["isolated_rechecks"] += 1
                        if not FJ._isolated_rematch(
                            cases[ci], got, kdir, ci
                        ) and not reference_envelope_match(
                            FJ, cases[ci], got, kdir, ci
                        ):
                            out["mismatches"] += 1
                            out.setdefault("failing", []).append(
                                {"kind": kind, "case": ci, "eb": eb,
                                 "sf": sf, "G": len(series)}
                            )
                else:
                    t, v = series[0]
                    segs = compress_series(t, v, cfg)
                    got = [
                        (s.start_ts, s.end_ts, s.mtid, s.cnt,
                         s.model.hex(), ())
                        for s in segs
                    ]
                    if got != expected[ci]:
                        out["mismatches"] += 1
                        out.setdefault("failing", []).append(
                            {"kind": kind, "case": ci, "eb": eb}
                        )
            out[f"{kind}_cases"] = n_cases
        if args.latency:
            rng = np.random.default_rng(args.seed + 2)
            lcases = [
                FJ._gen_case(rng, force_g1=False)
                + (int(rng.choice([17, 40, 100])),)
                for _ in range(args.latency)
            ]
            ldir = tmp / "latency"
            ldir.mkdir()
            lexp = FJ._java_expected(lcases, ldir, keep_kind=True)
            from modelardb_dynamic_spark.models.grouped import (
                compress_group as _cg,
            )

            for ci, (series, eb, sf, lat) in enumerate(lcases):
                cfg = EngineConfig(
                    error_bound=eb, length_bound=FJ.LB,
                    sampling_interval_ms=FJ.SI,
                )
                ts, V, _ = FJ._group_matrix(series)
                segs = _cg(
                    ts, V, cfg, split_fraction=sf, maximum_latency=lat
                )
                got = sorted(
                    (s.kind, s.start_ts, s.end_ts, s.mtid, s.cnt,
                     s.model.hex(), s.gaps)
                    for s in segs
                )
                if got != sorted(lexp[ci]):
                    out["isolated_rechecks"] += 1
                    if not FJ._isolated_rematch(
                        lcases[ci], got, ldir, ci, keep_kind=True
                    ) and not reference_envelope_match(
                        FJ, lcases[ci], got, ldir, ci, keep_kind=True
                    ):
                        out["mismatches"] += 1
                        out.setdefault("failing", []).append(
                            {"kind": "latency", "case": ci, "eb": eb,
                             "sf": sf, "lat": lat, "G": len(series)}
                        )
            out["latency_cases"] = args.latency
    print(json.dumps(out))


if __name__ == "__main__":
    main()
