"""Final aggregate report CLI (reference run_phase10_final_report.py).

Builds results/FINAL_REPORT.md: a curated headline section (throughput,
per-model test NMSE/latency, classical baselines, the information-floor
finding), training-curve + comparison figures, then the full JSON artifact
dump (reference :162-339 aggregates phase JSONs the same way).
"""
import argparse
import json
from pathlib import Path

from _common import add_config_arg, load_cfg


def _f(v, spec=".2f"):
    """Defensive format: '—' for missing values."""
    try:
        return format(v, spec)
    except (TypeError, ValueError):
        return "—"


def _get(d, *keys, default=None):
    for k in keys:
        if not isinstance(d, dict) or k not in d:
            return default
        d = d[k]
    return d


def build_headline(results_dir: Path, model_dir: Path) -> str:
    lines = []

    def _round_num(p: Path) -> int:
        try:
            return int("".join(ch for ch in p.stem.split("_r")[-1] if ch.isdigit()))
        except ValueError:
            return -1

    bench = None
    # numeric round order — lexical reverse sort would pick r09 over r10
    for bf in sorted(Path(".").glob("BENCH_r*.json"), key=_round_num, reverse=True):
        try:
            bench = json.loads(bf.read_text())
            # driver-recorded BENCH files nest the bench.py line under
            # 'parsed'; accept both layouts
            bench = bench.get("parsed", bench)
            bench["_file"] = bf.name
            break
        except json.JSONDecodeError:
            continue
    if bench:
        lines += [
            f"- **Throughput**: {_f(bench.get('value'), '.0f')} "
            f"{bench.get('unit')} on one chip "
            f"({_f(bench.get('vs_baseline'), '.0f')}× the reference CPU "
            f"implementation; {bench['_file']}).",
        ]

    diag = results_dir / "plateau_diagnosis.json"
    if diag.exists():
        d = json.loads(diag.read_text())
        fl = d.get("analytic_floor_db")
        sv = d.get("slice00_db", {})
        lines += [
            f"- **Information floor**: the reference-parity dataset "
            f"transmits the same pilot grid on every TX antenna, capping "
            f"every estimator at NMSE = (T−1)/T = {_f(fl)} dB "
            f"(full-tensor basis; {_f(sv.get('sum_oracle'))} "
            "dB on the models' per-sample slice basis) — see "
            "PLATEAU_DIAGNOSIS.md.",
        ]
        if "cnn_wiener" in sv and "mmse_full" in sv:
            delta = sv["mmse_full"] - sv["cnn_wiener"]
            rel = (
                f"{_f(delta)} dB better than"
                if delta >= 0
                else f"{_f(-delta)} dB behind"
            )
            lines += [
                f"- **Best learned estimator**: `cnn_wiener` "
                f"(residual-on-Wiener head, per-sample nmse loss) at "
                f"{_f(sv['cnn_wiener'])} dB — {rel} "
                "the full-Wiener classical estimator on the same "
                "basis at roughly half its latency (a metric-alignment "
                "win; see PLATEAU_DIAGNOSIS.md).",
            ]

    ats = results_dir / "at_scale_generation.json"
    if ats.exists():
        a = json.loads(ats.read_text())
        dr = a.get("digest_run", {})
        ot = a.get("online_train", {})
        lines += [
            f"- **At-scale factory**: {dr.get('samples', 0):,} frames "
            f"through the full sim+LS pipeline at "
            f"{_f(dr.get('device_samples_per_second'), ',.0f')} samples/s "
            "sustained on one chip (digest-manifest materialization; "
            "regenerate-and-verify "
            f"{'PASS' if dr.get('verify_pass') else 'FAIL'}). "
            "Online generate→train consumes "
            f"{ot.get('total_samples', 0):,} fresh frames at "
            f"{_f(ot.get('end_to_end_samples_per_second'), ',.0f')} "
            "samples/s with no storage in the loop "
            "(at_scale_generation.json).",
        ]

    rows = []
    for f in sorted(results_dir.glob("*_test_results.json")):
        r = json.loads(f.read_text())
        name = f.stem.replace("_test_results", "")  # filename, not the
        # stored model field — variant runs (cnn_wiener_mse) share a model
        rows.append(
            (name, r.get("nmse_db"), r.get("latency_ms_per_sample"),
             r.get("params"), r.get("checkpoint_epoch"))
        )
    if rows:
        lines += [
            "",
            "### Trained models (parity test split, slice basis)",
            "",
            "| model | NMSE (dB) | ms/sample | params | best epoch |",
            "|---|---|---|---|---|",
        ]
        for m, nm, lat, p, ep in sorted(rows, key=lambda r: r[1] or 0):
            lines.append(
                f"| {m} | {_f(nm)} | {_f(lat)} | {_f(p, ',')} | {ep} |"
            )

    study = Path("results_simo") / "identifiable_study.json"
    if study.exists():
        s = json.loads(study.read_text())
        ov = s.get("overall_db", {})
        if ov:
            lines += [
                "",
                "### Identifiable-regime study (1×2 SIMO, no floor)",
                "",
                "| method | NMSE (dB) |",
                "|---|---|",
            ] + [
                f"| {k} | {_f(v)} |"
                for k, v in sorted(ov.items(), key=lambda kv: kv[1])
            ] + ["", "Full table: ORTHOGONAL_STUDY.md."]

    par = results_dir / "parity_phase2.json"
    if par.exists():
        p = json.loads(par.read_text())
        avg = _get(p, "comparison", "avg_db", default={})
        ref = _get(p, "comparison", "reference_avg_db", default={})
        if avg:
            lines += [
                "",
                "### Reference parity (phase-2 published table)",
                "",
                "| method | ours (dB) | reference (dB) |",
                "|---|---|---|",
            ] + [
                f"| {k} | {_f(v)} | {ref.get(k, '—')} |"
                for k, v in avg.items()
            ]

    mfu = results_dir / "benchmark_suite.json"
    if mfu.exists():
        m = json.loads(mfu.read_text())
        tr = {k: v for k, v in m.items() if k.startswith("train_step") and "mfu" in v}
        if tr:
            lines += ["", "### Roofline (train steps)", ""]
            for k, v in tr.items():
                lines.append(
                    f"- `{k}`: {_f(v.get('ms_per_step'), '.1f')} ms/step, "
                    f"MFU {_f(v.get('mfu'), '.1%')}, bound: {v.get('bound', '?')}"
                )
    return "\n".join(lines)


def main():
    parser = add_config_arg(argparse.ArgumentParser(description=__doc__))
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("--model-dir", default="models")
    args = parser.parse_args()

    load_cfg(args)
    from ce5g_tpu.eval import generate_final_report, plot_training_curves

    rd = Path(args.results_dir)
    histories = {}
    for f in Path(args.model_dir).glob("*_history.json"):
        histories[f.stem.replace("_history", "")] = json.loads(f.read_text())
    lead, extra = {}, {}
    headline = build_headline(rd, Path(args.model_dir))
    if headline:
        lead["Headline results"] = headline
    if histories:
        p = rd / "training_curves.png"
        p.parent.mkdir(parents=True, exist_ok=True)
        plot_training_curves(histories, p)
        lead["Training curves"] = f"![training curves]({p.name})"

    generate_final_report(args.results_dir, extra_sections=extra,
                          lead_sections=lead)
    print(f"report → {rd / 'FINAL_REPORT.md'}")


if __name__ == "__main__":
    main()
