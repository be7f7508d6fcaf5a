"""Plotting: partition-metric line plots and 3D cloud juxtaposition.

Parity: reference tree_learn/util/plot.py (matplotlib partition plots at
plot.py:6-28; plotly juxtapose at plot.py:32-74).  plotly is optional here;
juxtapose falls back to matplotlib 3D scatter when it is absent.
"""

from __future__ import annotations

import numpy as np


def plot_evaluation_results_segments(ax, values, fontsize, measure,
                                     y_range=(0.6, 1), y_step=10,
                                     color="#ff7f0e", x_label="segment"):
    """Line plot of a per-partition metric (10 radial or vertical segments)."""
    y_pos = np.arange(len(values))
    ax.spines.right.set_visible(False)
    ax.spines.top.set_visible(False)
    ax.set_xticks(y_pos, np.arange(1, len(values) + 1))
    ax.set_yticks(np.arange(y_range[0], y_range[1] + 0.1, y_step))
    ax.set_xlabel(x_label, fontsize=fontsize)
    ax.set_ylabel(measure, fontsize=fontsize)
    ax.set_ylim(y_range)
    ax.plot(values, color=color)
    ax.tick_params(axis="both", which="major", labelsize=fontsize)
    return ax


def juxtapose(cloud1, cloud2, label1, label2, color1="blue", color2="red",
              subset=10, renderer="notebook", size=1, opacity=1):
    """Overlay two point clouds for visual error analysis (e.g. an
    undersegmenting prediction against the missed ground-truth tree)."""
    cloud1 = np.asarray(cloud1)[::subset]
    cloud2 = np.asarray(cloud2)[::subset]
    try:
        import plotly.express as px
        import pandas as pd

        points = np.vstack([cloud1, cloud2])
        names = [label1] * len(cloud1) + [label2] * len(cloud2)
        df = pd.DataFrame(points, columns=["x", "y", "z"])
        df["cloud"] = names
        fig = px.scatter_3d(df, x="x", y="y", z="z", color="cloud",
                            color_discrete_sequence=[color1, color2])
        fig.update_traces(marker=dict(size=size, opacity=opacity))
        if renderer:
            fig.show(renderer=renderer)
        return fig
    except ImportError:
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        ax.scatter(*cloud1.T, s=size, c=color1, label=label1, alpha=opacity)
        ax.scatter(*cloud2.T, s=size, c=color2, label=label2, alpha=opacity)
        ax.legend()
        return fig
