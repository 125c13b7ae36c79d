# SPDX-License-Identifier: Apache-2.0
"""Render benchmark CSVs into doc figures + a summary table.

Counterpart of the reference's docs/benchmarks/generate_plots.py (1022
LoC of Sphinx plotting): reads ``benchmarks/results/*.csv`` (written by
``run_benchmarks.py`` on the TPU chip) and emits PNG figures plus a
markdown summary into ``docs/benchmark_plots/``.

Chart conventions follow the data-viz method: form first (scaling =
line on log-log; matched-config comparison = grouped bars), color by
job (two fixed categorical slots from the validated reference palette:
TPU always slot 1 blue, H100 reference always slot 2 orange — color
follows the entity, never rank), one axis per chart, thin marks,
recessive grid, legend for two series.
"""

import csv
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "results")
OUT = os.path.join(os.path.dirname(HERE), "docs", "benchmark_plots")

# validated reference palette (dataviz skill, slots 1-2, light mode)
TPU_BLUE = "#2a78d6"
H100_ORANGE = "#eb6834"
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"

# reference H100 numbers for matched configs (BASELINE.md)
H100_MATCHED = {
    "PME recip\n97k vs 16k (H100)": 0.774,  # ms, their 16k-atom number
    "Batched Ewald\n64x2000": 24.9,
    "Batched D3\n128x2000": 46.0,
    "Batched PME\n64x2000": 5.76,
}


def _style(ax):
    ax.set_facecolor(SURFACE)
    ax.grid(True, which="major", axis="y", color="#e4e3df", linewidth=0.6)
    ax.tick_params(colors=INK2, labelsize=9)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#d4d3cd")
    ax.title.set_color(INK)
    ax.xaxis.label.set_color(INK2)
    ax.yaxis.label.set_color(INK2)


def load(name):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return list(csv.DictReader(fh))


def scaling_figure():
    """Time vs atoms, log-log, one line per method (per CSV)."""
    series = defaultdict(list)
    for fname, label in [
        ("neighborlist_benchmark_tpu-chip.csv", "grid build"),
        ("dftd3_benchmark_tpu-chip.csv", "DFT-D3 E+F"),
        ("pme_benchmark_tpu-chip.csv", "PME reciprocal E+F (64^3)"),
    ]:
        for row in load(fname):
            if row.get("mesh") and int(row["mesh"]) != 64:
                continue
            a, t = int(row["atoms"]), float(row["time_ms"])
            if t > 0 and a >= 4096:
                series[label].append((a, t))
    if not series:
        return False
    fig, ax = plt.subplots(figsize=(6.4, 4.2), dpi=140)
    fig.patch.set_facecolor(SURFACE)
    colors = [TPU_BLUE, H100_ORANGE, "#1baf7a"]  # fixed slot order
    for (label, pts), c in zip(series.items(), colors):
        pts.sort()
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=c, linewidth=2, marker="o", markersize=4,
                label=label)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("atoms")
    ax.set_ylabel("time (ms)")
    ax.set_title("Scaling on one TPU chip (f32, energies + forces)")
    _style(ax)
    leg = ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "scaling.png"),
                facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)
    return True


def matched_config_figure():
    """Grouped bars: TPU vs the reference's published H100 numbers."""
    tpu = {}
    for row in load("pme_benchmark_tpu-chip.csv"):
        if int(row["atoms"]) >= 90000 and int(row["mesh"]) == 64:
            tpu["PME recip\n97k vs 16k (H100)"] = float(row["time_ms"])
    for row in load("ewald_benchmark_tpu-chip.csv"):
        tpu.setdefault("Batched Ewald\n64x2000", float(row["time_ms"]))
    for row in load("dftd3_batch_benchmark_tpu-chip.csv"):
        tpu.setdefault("Batched D3\n128x2000", float(row["time_ms"]))
    for row in load("pme_batch_benchmark_tpu-chip.csv"):
        if row["method"].endswith("windowed"):
            tpu.setdefault("Batched PME\n64x2000", float(row["time_ms"]))
    keys = [k for k in H100_MATCHED if k in tpu]
    if not keys:
        return False
    fig, ax = plt.subplots(figsize=(7.0, 4.0), dpi=140)
    fig.patch.set_facecolor(SURFACE)
    xs = range(len(keys))
    w = 0.38
    ax.bar([x - w / 2 - 0.01 for x in xs], [tpu[k] for k in keys], w,
           color=TPU_BLUE, label="this library (TPU chip)", zorder=3)
    ax.bar([x + w / 2 + 0.01 for x in xs], [H100_MATCHED[k] for k in keys],
           w, color=H100_ORANGE, label="reference (H100, published)",
           zorder=3)
    for x, k in zip(xs, keys):
        ax.text(x - w / 2 - 0.01, tpu[k], f"{tpu[k]:.1f}", ha="center",
                va="bottom", fontsize=8, color=INK2)
        ax.text(x + w / 2 + 0.01, H100_MATCHED[k], f"{H100_MATCHED[k]:.1f}",
                ha="center", va="bottom", fontsize=8, color=INK2)
    ax.set_xticks(list(xs))
    ax.set_xticklabels(keys, fontsize=8.5, color=INK)
    ax.margins(x=0.02)
    ax.set_ylabel("time (ms) — lower is better")
    ax.set_title("Matched benchmark configs")
    _style(ax)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "matched_configs.png"),
                facecolor=SURFACE, bbox_inches="tight")
    plt.close(fig)
    return True


def summary_markdown():
    lines = ["# Benchmark results (generated)", "",
             "Regenerate with `python benchmarks/generate_plots.py` after",
             "`python benchmarks/run_benchmarks.py` (TPU chip).", ""]
    for fname in sorted(os.listdir(RESULTS)):
        if not fname.endswith(".csv"):
            continue
        rows = load(fname)
        if not rows:
            continue
        lines.append(f"## {fname}")
        lines.append("")
        cols = list(rows[0].keys())
        lines.append("| " + " | ".join(cols) + " |")
        lines.append("|" + "---|" * len(cols))
        for r in rows:
            lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
        lines.append("")
    with open(os.path.join(OUT, "RESULTS.md"), "w") as fh:
        fh.write("\n".join(lines))


def main():
    os.makedirs(OUT, exist_ok=True)
    did = []
    if scaling_figure():
        did.append("scaling.png")
    if matched_config_figure():
        did.append("matched_configs.png")
    summary_markdown()
    did.append("RESULTS.md")
    print("wrote", ", ".join(did), "->", OUT)


if __name__ == "__main__":
    main()
