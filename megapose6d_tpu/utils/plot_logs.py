"""Training-curve plotting from run-dir log.txt files.

Re-design of the reference's bokeh log plotter
(megapose6d: src/megapose/utils/logs_bokeh.py:43-310) on matplotlib:
`log.txt` is JSON-lines per epoch (training/train.py), one subplot per
metric, one line per run.
"""

from __future__ import annotations

import json
from pathlib import Path


def load_logs(run_dirs: list[str | Path]) -> dict[str, list[dict]]:
    logs = {}
    for rd in run_dirs:
        rd = Path(rd)
        path = rd / "log.txt"
        if path.exists():
            logs[rd.name] = [
                json.loads(line)
                for line in path.read_text().splitlines()
                if line.strip()
            ]
    return logs


def plot_logs(
    run_dirs: list[str | Path],
    metrics: list[str] = ("loss_total", "grad_norm"),
    out_path: str | Path | None = None,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    logs = load_logs(run_dirs)
    fig, axes = plt.subplots(
        1, len(metrics), figsize=(5 * len(metrics), 4), squeeze=False
    )
    for ax, metric in zip(axes[0], metrics):
        for run, rows in logs.items():
            xs = [r["epoch"] for r in rows if metric in r]
            ys = [r[metric] for r in rows if metric in r]
            if xs:
                ax.plot(xs, ys, label=run)
        ax.set_xlabel("epoch")
        ax.set_title(metric)
        ax.legend(fontsize=7)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return fig
