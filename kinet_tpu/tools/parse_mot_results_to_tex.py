"""MOTChallenge summary -> LaTeX table rows
(reference: src/parse_mot_results_to_tex.py).

Reads the metric summaries produced by engine.track (or a results dir
evaluated against GT) and prints LaTeX rows with the standard column
order: MOTA IDF1 MOTP Rcll Prcn FP FN IDSW.
"""
from __future__ import annotations

import argparse
import json


def to_tex(summary: dict, caption: str = "Results") -> str:
    header = (
        "\\begin{table}\n\\centering\n"
        "\\begin{tabular}{l|rrrrr|rrr}\n"
        "Seq & MOTA & IDF1 & MOTP & Rcll & Prcn & FP & FN & IDSW \\\\\n\\hline\n"
    )
    rows = []
    for name, m in summary.items():
        rows.append(
            f"{name} & {100 * m['mota']:.2f} & {100 * m['idf1']:.2f} & "
            f"{100 * (1 - m['motp']):.2f} & {100 * m['recall']:.2f} & "
            f"{100 * m['precision']:.2f} & {m['num_false_positives']} & "
            f"{m['num_misses']} & {m['num_switches']} \\\\"
        )
    footer = (
        "\n\\end{tabular}\n"
        f"\\caption{{{caption}}}\n\\end{{table}}\n"
    )
    return header + "\n".join(rows) + footer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("summary_json", help="json dump of the metric summary")
    p.add_argument("--caption", default="Results")
    args = p.parse_args(argv)
    with open(args.summary_json) as f:
        summary = json.load(f)
    print(to_tex(summary, args.caption))


if __name__ == "__main__":
    main()
