"""Validation report generator — the analogue of the reference's
test-report-generation harness (cases/auto-testing/test-report-generation/
essential/generate.sh + per-case plot scripts singleParticle.py,
multiParticle.py, pressureDrop.py, expMueller.py), emitting a markdown
report with embedded plots instead of a LaTeX/PDF build.

Consumes results/report.json + the curve artifacts written by
scripts/run_all_cases.py, plots each case against its benchmark data,
and writes results/report.md + results/plots/*.png.

  python scripts/generate_report.py [--results results/]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

REF = "/root/reference/cases/auto-testing/test-cases"


def plot_xiaocase1(results, plots, lines):
    f = os.path.join(results, "xiaocase1_dp_curve.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    bench = np.loadtxt(os.path.join(REF, "xiaocase1", "data", "p_bench.dat"))
    plt.figure(figsize=(7, 4))
    plt.plot(d["times"], d["dp"], "r-", lw=1.5, label="sedifoam-tpu")
    plt.plot(bench[:, 0], bench[:, 1], "k--", lw=1.5, label="benchmark")
    plt.xlabel("t [s]")
    plt.ylabel("probe pressure drop [Pa]")
    plt.title("xiaocase1: fluidized-pipe pressure drop (Xiao & Sun 2011)")
    plt.legend()
    out = os.path.join(plots, "xiaocase1_dp.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![xiaocase1](plots/xiaocase1_dp.png)\n")


def plot_mueller(case, results, plots, lines):
    f = os.path.join(results, f"{case}_profiles.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    names = [k for k in d.files]
    plt.figure(figsize=(7, 4))
    colors = ["r", "b", "g", "m"]
    for i, name in enumerate(sorted(names)):
        prof = d[name]  # columns: x, ux, uy, uz
        plt.plot(prof[:, 0] * 1e3, prof[:, 2], colors[i % 4] + "-",
                 lw=1.5, label=f"{name} (ours)")
        bench_f = os.path.join(REF, case, "data", "sets_bench",
                               f"{name}_UaMean.xy")
        if os.path.exists(bench_f):
            b = np.loadtxt(bench_f)
            plt.plot(b[:, 0] * 1e3, b[:, 2], colors[i % 4] + "--", lw=1.0,
                     label=f"{name} (bench)")
    exp_f = os.path.join(REF, case, "data", "experimentData")
    if os.path.exists(exp_f):
        try:
            e = np.loadtxt(exp_f)
            plt.plot(e[:, 0] * 1e3, e[:, 1], "ko", ms=4, label="experiment")
        except Exception:
            pass
    plt.xlabel("x [mm]")
    plt.ylabel("UaMean_y [m/s]")
    plt.title(f"{case}: time-averaged solid velocity profiles "
              "(Mueller et al. bubbling bed)")
    plt.legend(fontsize=7)
    out = os.path.join(plots, f"{case}_profiles.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append(f"![{case}](plots/{case}_profiles.png)\n")


def plot_wachem(results, plots, lines):
    f = os.path.join(results, "expWachem_PCM_probes.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    p = d["p"]
    dp = d["dp"] if "dp" in d.files else p[:, 0] - p[:, -1]
    plt.figure(figsize=(7, 4))
    plt.plot(d["times"], p[:, 0], "r-", lw=1, label="local pressure")
    plt.plot(d["times"], dp, "k.", ms=2, label="relative pressure")
    plt.xlabel("t [s]")
    plt.ylabel("p [Pa]")
    plt.title("expWachem_PCM: bed pressure signal (van Wachem)")
    plt.legend()
    out = os.path.join(plots, "expWachem_pressure.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![expWachem](plots/expWachem_pressure.png)\n")


def plot_jetflow(results, plots, lines):
    f = os.path.join(results, "jetflow_centerline.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    times, uc = d["times"], d["uc"]
    stations = [int(s) for s in d["stations"]]    # y/D probe stations
    D, U0 = float(d["D"]), float(d["U0"])
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    for i, s in enumerate(stations):
        a1.plot(times, uc[:, i] / U0, lw=1, label=f"y/D={s}")
    a1.set_xlabel("t [s]")
    a1.set_ylabel("Uc / U0")
    a1.set_title("jetFlow: centerline velocity (kEqn LES)")
    a1.legend(fontsize=8)
    late = times > 0.6 * times[-1]
    uc_mean = uc[late].mean(axis=0)
    inv = np.asarray(stations, float)
    a2.plot(inv, U0 / np.maximum(uc_mean, 1e-9), "ro-",
            label="sedifoam-tpu (late-time mean)")
    a2.plot(inv, inv / 5.8, "k--", label="U0/Uc = (y/D)/B, B=5.8 (exp.)")
    a2.set_xlabel("y/D")
    a2.set_ylabel("U0 / Uc")
    a2.set_title("round-jet decay")
    a2.legend(fontsize=8)
    out = os.path.join(plots, "jetflow_decay.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![jetFlow](plots/jetflow_decay.png)\n")


def plot_bl24(results, plots, lines):
    f = os.path.join(results, "bl24_bedprofile.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    a1.plot(d["t"], d["ub"], "b-", lw=1, label="bulk Ub_x")
    a1.axhline(0.167, color="k", ls="--", lw=1,
               label="Ubar target 0.167 m/s")
    a1.set_xlabel("t [s]")
    a1.set_ylabel("beta-weighted bulk Ub_x [m/s]")
    a1.set_title("BL24-TH1: Ubar channel-forcing lock")
    a1.legend(fontsize=8)
    a2.plot(d["x_bins"] * 1e3, d["bed_h"] * 1e3, "ro-")
    a2.set_xlabel("x [mm]")
    a2.set_ylabel("bed height (95th pct) [mm]")
    a2.set_title("x-resolved bed profile (dune precursor)")
    out = os.path.join(plots, "bl24_bed.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![BL24-TH1](plots/bl24_bed.png)\n")


def plot_bedload(results, plots, lines):
    f = os.path.join(results, "bedload_transport.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    plt.figure(figsize=(7, 4))
    plt.plot(d["t"], d["q_star"], "b-", lw=0.8, alpha=0.6,
             label="instantaneous q*")
    plt.axhline(float(d["q_star_mean"]), color="r", lw=1.5,
                label=f"mean q* = {float(d['q_star_mean']):.2f}")
    plt.axhline(float(d["q_star_mpm"]), color="k", ls="--", lw=1.5,
                label=f"MPM 8(θ-θc)^1.5 = {float(d['q_star_mpm']):.2f} "
                      f"(θ = {float(d['theta']):.3f})")
    plt.xlabel("t [s]")
    plt.ylabel("q* = q / sqrt((s-1) g d³)")
    plt.title("transport-bedload: bed-load rate vs Meyer-Peter & Müller")
    plt.legend(fontsize=8)
    out = os.path.join(plots, "bedload_qstar.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![bedload](plots/bedload_qstar.png)\n")


def plot_suspended(results, plots, lines):
    f = os.path.join(results, "suspended_transport.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    a1.plot(d["t"], d["ycom"] * 1e3, "b-", lw=1)
    a1.set_xlabel("t [s]")
    a1.set_ylabel("mobile-particle CoM height [mm]")
    a1.set_title(f"transport-suspended: suspension rise "
                 f"(Rouse P = {float(d['rouse']):.2f})")
    a2.plot(d["t"], d["frac_hi"], "r-", lw=1,
            label="mass fraction above 25% depth")
    a2.plot(d["t"], d["q"] / max(float(np.abs(d["q"]).max()), 1e-12),
            "g-", lw=0.8, alpha=0.6, label="q (normalized)")
    a2.set_xlabel("t [s]")
    a2.legend(fontsize=8)
    a2.set_title("suspension regime indicators")
    out = os.path.join(plots, "suspended_transport.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![suspended](plots/suspended_transport.png)\n")


def plot_dune(results, plots, lines):
    f = os.path.join(results, "dune_migration.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    a1.plot(d["t"], d["xcom"] * 1e3, "b-", lw=1)
    a1.set_xlabel("t [s]")
    a1.set_ylabel("crest-layer CoM x [mm]")
    a1.set_title(f"transport-vortex-dune: crest migration "
                 f"({float(d['migration'])*1e3:.2f} mm)")
    a2.plot(d["t"], d["q"], "g-", lw=0.8)
    a2.set_xlabel("t [s]")
    a2.set_ylabel("streamwise transport q")
    a2.set_title(f"bed-load rate (q* = {float(d['q_star']):.3f})")
    out = os.path.join(plots, "dune_migration.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![dune](plots/dune_migration.png)\n")


def plot_irregular(results, plots, lines):
    f = os.path.join(results, "irregular_rigidity.npz")
    if not os.path.exists(f):
        return
    d = np.load(f)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
    a1.hist(np.abs(d["gaps1"] - d["gaps0"]) * 1e9, bins=30,
            color="steelblue")
    a1.set_xlabel("member-gap drift over the run [nm]")
    a1.set_ylabel("count")
    a1.set_title("irregular: rigid-clump member-distance preservation")
    a2.plot(d["vx"], "b-", lw=1, label="clump vx")
    a2.plot(d["vy"], "r-", lw=1, label="clump vy")
    a2.set_xlabel("sample")
    a2.set_ylabel("mean mobile-clump velocity [m/s]")
    a2.set_title("clump transport under the current")
    a2.legend(fontsize=8)
    out = os.path.join(plots, "irregular_rigidity.png")
    plt.savefig(out, dpi=110, bbox_inches="tight")
    plt.close()
    lines.append("![irregular](plots/irregular_rigidity.png)\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=os.path.join(
        os.path.dirname(__file__), "..", "results"))
    args = ap.parse_args()
    results = os.path.abspath(args.results)
    plots = os.path.join(results, "plots")
    os.makedirs(plots, exist_ok=True)

    report_f = os.path.join(results, "report.json")
    report = {}
    if os.path.exists(report_f):
        with open(report_f) as fh:
            report = json.load(fh)

    lines = ["# sedifoam-tpu validation report\n",
             "Auto-testing battery (the reference's "
             "`cases/auto-testing` suite) — see `report.json` "
             "for raw metrics.\n"]
    if report.get("cases"):
        lines.append("| case | verdict | key metrics |")
        lines.append("|---|---|---|")
        for name, entry in report["cases"].items():
            metrics = {k: round(v, 4) for k, v in entry.items()
                       if isinstance(v, float) and k not in ("wall_s",)}
            verdict = "PASS" if entry.get("passed") else "FAIL"
            lines.append(f"| {name} | {verdict} | `{metrics}` |")
        lines.append("")

    plot_xiaocase1(results, plots, lines)
    plot_mueller("expMueller06", results, plots, lines)
    plot_mueller("expMueller09", results, plots, lines)
    plot_wachem(results, plots, lines)
    plot_jetflow(results, plots, lines)
    plot_bl24(results, plots, lines)
    plot_bedload(results, plots, lines)
    plot_suspended(results, plots, lines)
    plot_dune(results, plots, lines)
    plot_irregular(results, plots, lines)

    out = os.path.join(results, "report.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out} + plots/")


if __name__ == "__main__":
    main()
