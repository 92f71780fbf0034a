"""Training-curve plotting from log.csv (reference Ploting.py:20-69).

plot_data(path) renders loss and IoU train/val curves. Improvements over the
reference: headless-safe (Agg, saves PNGs next to the csv instead of requiring
a display), optional every-N epoch sampling (the reference hardcodes every
10th row, Ploting.py:57), and extra columns (acc) plotted when present.
"""

import csv
import os
from typing import Dict, List, Optional


def read_log(path: str, every: int = 1) -> Dict[str, List[float]]:
    cols: Dict[str, List[float]] = {}
    with open(path, "r") as f:
        for i, row in enumerate(csv.DictReader(f)):
            if (i + 1) % every:
                continue
            for k, v in row.items():
                cols.setdefault(k, []).append(float(v))
    return cols


def _plot_pair(plt, epochs, y1, y2, ylabel, labels, out_path):
    fig = plt.figure()
    plt.plot(epochs, y1, color="red", marker="|", label=labels[0])
    plt.plot(epochs, y2, color="blue", marker="|", label=labels[1])
    plt.xlabel("epoch")
    plt.ylabel(ylabel)
    plt.legend()
    plt.title(f"{ylabel}_result")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_data(path: str, every: int = 10, out_dir: Optional[str] = None,
              show: bool = False):
    """Plot loss/IoU (and acc if logged) curves from a run's log.csv
    (reference Ploting.py:39-63). Returns the list of written PNG paths."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = read_log(path, every=max(1, every))
    out_dir = out_dir or os.path.dirname(os.path.abspath(path))
    epochs = [int(e) for e in cols["epoch"]]
    written = []
    written.append(_plot_pair(plt, epochs, cols["loss"], cols["val_loss"], "Loss",
                              ("train_loss", "val_loss"),
                              os.path.join(out_dir, "loss.png")))
    written.append(_plot_pair(plt, epochs, cols["iou"], cols["val_iou"], "iou",
                              ("train_iou", "val_iou"),
                              os.path.join(out_dir, "iou.png")))
    if "acc" in cols and "val_acc" in cols:
        written.append(_plot_pair(plt, epochs, cols["acc"], cols["val_acc"], "acc",
                                  ("train_acc", "val_acc"),
                                  os.path.join(out_dir, "acc.png")))
    if show:
        plt.show()
    return written
