#!/usr/bin/env python
"""Render an Elo ladder from the committed head-to-head records.

Every strength artifact in this repo is a binomial record against a fixed
opponent; this tool converts them into one ladder anchored at the
reference's strongest shipped net (policy_17 := 0 Elo) so relative
strength is readable at a glance.  Elo(p) = -400·log10(1/p - 1); the CI
maps the exact (Clopper-Pearson) binomial interval through the same
transform.  Pure presentation — no new games are played.

Inputs (all committed):
  data/training_logs/policy_curve.txt         raw-policy gens vs policy_17
  data/training_logs/policy_sl20m_anchor.txt  20M-pair SL net vs policy_17
  data/training_logs/anchor_match_r3.txt      full-search own-weights match
  data/matches_r3/tally.txt                   engine-vs-engine match

Usage: python tools/elo_table.py [--markdown]
"""

import argparse
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def clopper_pearson(w: int, n: int, alpha: float = 0.05):
    """Exact binomial CI via the beta-quantile identity (bisection).

    Pure python on purpose — this is the one Clopper-Pearson helper the
    tools share (match_table.py imports it), so the numbers in every doc
    come from the same code path regardless of scipy availability."""

    def beta_ppf(q, a, b):
        # regularized incomplete beta by continued fraction (Lentz), then
        # invert by bisection; accurate to ~1e-9 which is far below the
        # statistical noise here
        def betacf(x, a, b):
            qab, qap, qam = a + b, a + 1.0, a - 1.0
            c, d = 1.0, 1.0 - qab * x / qap
            if abs(d) < 1e-300:
                d = 1e-300
            d = 1.0 / d
            h = d
            for m in range(1, 200):
                m2 = 2 * m
                aa = m * (b - m) * x / ((qam + m2) * (a + m2))
                d = 1.0 + aa * d
                if abs(d) < 1e-300:
                    d = 1e-300
                c = 1.0 + aa / c
                if abs(c) < 1e-300:
                    c = 1e-300
                d = 1.0 / d
                h *= d * c
                aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
                d = 1.0 + aa * d
                if abs(d) < 1e-300:
                    d = 1e-300
                c = 1.0 + aa / c
                if abs(c) < 1e-300:
                    c = 1e-300
                d = 1.0 / d
                delta = d * c
                h *= delta
                if abs(delta - 1.0) < 1e-12:
                    break
            return h

        def ibeta(x, a, b):
            if x <= 0.0:
                return 0.0
            if x >= 1.0:
                return 1.0
            ln = (
                math.lgamma(a + b)
                - math.lgamma(a)
                - math.lgamma(b)
                + a * math.log(x)
                + b * math.log1p(-x)
            )
            front = math.exp(ln)
            if x < (a + 1.0) / (a + b + 2.0):
                return front * betacf(x, a, b) / a
            return 1.0 - math.exp(
                math.lgamma(a + b)
                - math.lgamma(b)
                - math.lgamma(a)
                + b * math.log1p(-x)
                + a * math.log(x)
            ) * betacf(1.0 - x, b, a) / b

        lo, hi = 0.0, 1.0
        for _ in range(200):
            mid = (lo + hi) / 2.0
            if ibeta(mid, a, b) < q:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2.0

    lo = 0.0 if w == 0 else beta_ppf(alpha / 2.0, w, n - w + 1)
    hi = 1.0 if w == n else beta_ppf(1.0 - alpha / 2.0, w + 1, n - w)
    return lo, hi


def elo(p: float) -> float:
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    return -400.0 * math.log10(1.0 / p - 1.0)


def row(name: str, w: int, n: int, note: str = ""):
    lo, hi = clopper_pearson(w, n)
    p = w / n
    return (
        name,
        f"{w}/{n}",
        f"{p:.3f}",
        f"{elo(p):+.0f}",
        f"[{elo(lo):+.0f}, {elo(hi):+.0f}]",
        note,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--markdown", action="store_true", default=True)
    ap.parse_args()

    rows = []

    curve = os.path.join(REPO, "data/training_logs/policy_curve.txt")
    if os.path.exists(curve):
        for line in open(curve):
            m = re.match(r"gen (\w+): (\d+)/(\d+)", line)
            if m and m.group(1).isdigit():
                g, w, n = m.group(1), int(m.group(2)), int(m.group(3))
                rows.append(row(f"rl_pool/policy_{g} (raw policy)", w, n))

    sl = os.path.join(REPO, "data/training_logs/policy_sl20m_anchor.txt")
    if os.path.exists(sl):
        for line in open(sl):
            m = re.search(r"policy_sl20m: (\d+)/(\d+)", line)
            if m:
                rows.append(
                    row(
                        "policy_sl20m (raw policy)",
                        int(m.group(1)),
                        int(m.group(2)),
                        "SL-only, 27.9M pairs",
                    )
                )

    anchor = os.path.join(REPO, "data/training_logs/anchor_match_r3.txt")
    if os.path.exists(anchor):
        txt = open(anchor).read()
        m = re.search(r"A won (\d+)/(\d+)", txt)
        if m:
            w, n = int(m.group(1)), int(m.group(2))
            rows.append(
                row(
                    "policy_8+value_own (400-rollout search)",
                    w,
                    n,
                    "vs policy_17+value_r2, same search",
                )
            )

    az_raw = os.path.join(REPO, "data/training_logs/az_r4_raw_anchor_curve.txt")
    if os.path.exists(az_raw):
        for line in open(az_raw):
            m = re.match(r"gen (\S+): (\d+)/(\d+)", line)
            if m:
                rows.append(
                    row(
                        # include the gen name so a multi-gen curve file
                        # can't produce indistinguishable duplicate rows
                        # (ADVICE r4 #5)
                        f"az_r4 {m.group(1)} (raw policy)",
                        int(m.group(2)),
                        int(m.group(3)),
                        "AZ loop seeded from policy_8",
                    )
                )

    az_full = os.path.join(REPO, "data/training_logs/az_r4_vs_policy17.txt")
    if os.path.exists(az_full):
        m = re.search(r"A won (\d+)/(\d+)", open(az_full).read())
        if m:
            rows.append(
                row(
                    "az_r4+value (400-rollout search)",
                    int(m.group(1)),
                    int(m.group(2)),
                    "vs policy_17+value_r2, same search",
                )
            )

    tally = os.path.join(REPO, "data/matches_r3/tally.txt")
    if os.path.exists(tally):
        lines = [l for l in open(tally) if l.startswith("game")]
        w = sum(" WON " in l for l in lines)
        rows.append(
            row(
                "bokego-tpu engine (2.5s/move, TPU)",
                w,
                len(lines),
                "vs reference engine, 2500 fixed rollouts + pondering",
            )
        )

    print("| player | record | winrate | Elo vs policy_17 | 95% CI | notes |")
    print("|---|---|---|---|---|---|")
    print("| policy_17 / reference engine | — | — | +0 (anchor) | — | |")
    for r in rows:
        print("| " + " | ".join(r) + " |")
    print(
        "\nElo(p) = -400·log10(1/p−1), exact binomial CI mapped through "
        "the same transform; all records are independent head-to-heads vs "
        "the anchor, not a joint Bradley-Terry fit."
    )


if __name__ == "__main__":
    main()
