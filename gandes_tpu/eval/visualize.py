"""Visualization surface (reference `MMGAN_MIDI_DES/visualize.py:68-76`,
`matrix_sim_process.py:202-245`, `simlog_to_vid.ipynb`, demo.ipynb
spectrogram cells) — headless-friendly: every function takes
``show``/``save_path``.
"""

from __future__ import annotations

import re

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.lines as mlines
import matplotlib.pyplot as plt


def visualize_piano_roll(piano_roll, show=False, save_path=None):
    """Per-note velocity line plot (`visualize.py:68-76`)."""
    fig = plt.figure(figsize=(10, 6))
    for i in range(piano_roll.shape[0]):
        plt.plot(piano_roll[i], label=f"Note {i + 1}")
    plt.title("Piano Roll")
    plt.xlabel("Time Step")
    plt.ylabel("Velocity")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


def display_images(image_tensor, num_images=25, size=(1, 28, 28), nrow=5,
                   padding=2, show=False, save_path=None):
    """Image-grid display (reference `GAN_DES/SIMNN.py:30-35`): flatten to
    ``(-1, *size)``, tile the first ``num_images`` into a ``nrow``-column
    grid (torchvision ``make_grid`` layout: 2px padding, row-major), imshow.
    """
    imgs = np.asarray(image_tensor, dtype=float).reshape(-1, *size)[:num_images]
    n, (c, h, w) = len(imgs), size
    if c == 1:  # make_grid expands single-channel to gray RGB
        imgs, c = np.repeat(imgs, 3, axis=1), 3
    cols = min(nrow, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((c, padding + rows * (h + padding),
                     padding + cols * (w + padding)), dtype=imgs.dtype)
    for k, img in enumerate(imgs):
        r, col = divmod(k, cols)
        y, x = padding + r * (h + padding), padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = img
    fig = plt.figure()
    plt.imshow(np.transpose(grid, (1, 2, 0)).squeeze())
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return grid


def plot_input_matrix(matrix, sources, servers, show=False, save_path=None):
    """Routing-matrix heatmap with source/server diagonal overlay
    (`matrix_sim_process.py:202-245`)."""
    matrix_copy = np.array(matrix, dtype=float, copy=True)
    n = matrix_copy.shape[0]
    for i in range(n):
        matrix_copy[i, i] = np.nan

    fig = plt.figure(figsize=(10, 8))
    im = plt.imshow(matrix_copy, cmap=plt.get_cmap("viridis"),
                    vmin=np.nanmin(matrix_copy), vmax=np.nanmax(matrix_copy))
    for i in range(n):
        if i in sources:
            plt.scatter(i, i, color="green", s=40)
        if i in servers:
            plt.scatter(i, i, color="red", s=40)
    red = mlines.Line2D([], [], color="red", marker="o", markersize=10,
                        label="Server", linestyle="None")
    green = mlines.Line2D([], [], color="green", marker="o", markersize=10,
                          label="Source", linestyle="None")
    plt.legend(handles=[red, green])
    plt.title("Matrix Transition Probabilities")
    plt.xlabel("Transition probability from row to column")
    plt.colorbar(im, label="Matrix Values")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


def plot_spectrogram(mel, sr=44100, show=False, save_path=None, title="Mel spectrogram (dB)"):
    """demo.ipynb-style mel display."""
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(mel), aspect="auto", origin="lower", cmap="magma")
    ax.set_title(title)
    ax.set_xlabel("Frame")
    ax.set_ylabel("Mel bin")
    fig.colorbar(im, ax=ax, format="%+2.0f dB")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)


_LOG_RE = re.compile(
    r"INFO:root:([0-9]*\.[0-9]+|[0-9]+) - ([0-9]*\.[0-9]+|[0-9]+) - "
    r"([0-9]*\.[0-9]+|[0-9]+) - (arrival|departure)"
)


def simulation_log_to_gif(log_lines_or_path, out_path="simulation.gif",
                          n_frames=40, fps=8):
    """Queue-length-over-time animation from a 'Music' event log
    (replaces `simlog_to_vid.ipynb` cells 0-2). Writes an animated GIF via
    pillow; returns the per-frame queue-length matrix."""
    if isinstance(log_lines_or_path, str):
        with open(log_lines_or_path) as f:
            lines = f.read().splitlines()
    else:
        lines = list(log_lines_or_path)

    events = []
    for line in lines:
        m = _LOG_RE.match(line)
        if m:
            t, _eid, srv, kind = m.groups()
            events.append((float(t), int(srv), 1 if kind == "arrival" else -1))
    if not events:
        raise ValueError("no parsable events in log")

    servers = sorted({srv for _, srv, _ in events})
    idx = {s: i for i, s in enumerate(servers)}
    times = [t for t, _, _ in events]
    t0, t1 = min(times), max(times)
    frame_edges = np.linspace(t0, t1, n_frames + 1)

    lengths = np.zeros(len(servers))
    frames = np.zeros((n_frames, len(servers)))
    ei = 0
    ordered = sorted(events, key=lambda e: e[0])
    for fi in range(n_frames):
        while ei < len(ordered) and ordered[ei][0] <= frame_edges[fi + 1]:
            _, srv, delta = ordered[ei]
            lengths[idx[srv]] = max(0, lengths[idx[srv]] + delta)
            ei += 1
        frames[fi] = lengths

    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, ax = plt.subplots(figsize=(8, 4))
    bars = ax.bar(range(len(servers)), frames[0])
    ax.set_ylim(0, max(frames.max(), 1) * 1.1)
    ax.set_xticks(range(len(servers)))
    ax.set_xticklabels([str(s) for s in servers])
    ax.set_xlabel("Server")
    ax.set_ylabel("Queue length")

    def update(fi):
        for b, h in zip(bars, frames[fi]):
            b.set_height(h)
        ax.set_title(f"t = {frame_edges[fi + 1]:.2f}")
        return bars

    anim = FuncAnimation(fig, update, frames=n_frames)
    anim.save(out_path, writer=PillowWriter(fps=fps))
    plt.close(fig)
    return frames


def render_computation_graph(fn, *example_args, save_path="computation_graph.png",
                             max_eqns=120, title=None, **fn_kwargs):
    """Render a jitted computation's dataflow graph to PNG (+ the jaxpr
    text next to it) — the jaxpr analog of the reference's torchviz
    ``make_dot`` dumps (`MMGAN_MIDI_DES/network_tests.py:180-188`,
    artifact `output_graph_generator.png`).

    Traces ``fn(*example_args)`` with ``jax.make_jaxpr``, lays the
    equations out in topological layers, and draws primitive boxes with
    output shapes — matplotlib only, no graphviz binary needed. Graphs
    longer than ``max_eqns`` equations render the head and note the
    truncation (the full jaxpr text is always written). Returns save_path.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch

    import jax

    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **fn_kwargs))(*example_args)
    with open(save_path + ".jaxpr.txt", "w") as f:
        f.write(jaxpr.pretty_print(use_color=False))

    eqns = jaxpr.jaxpr.eqns
    truncated = len(eqns) > max_eqns
    eqns = eqns[:max_eqns]

    # layered topological layout: depth(eqn) = 1 + max(depth of producers)
    var_depth = {id(v): 0 for v in jaxpr.jaxpr.invars}
    var_label = {id(v): f"in{i}" for i, v in enumerate(jaxpr.jaxpr.invars)}
    node_depth, layers = [], {}
    for e in eqns:
        d = 1 + max([var_depth.get(id(v), 0) for v in e.invars
                     if hasattr(v, "aval")] or [0])
        node_depth.append(d)
        for v in e.outvars:
            var_depth[id(v)] = d
        layers.setdefault(d, []).append(len(node_depth) - 1)

    pos = {}
    for d, members in layers.items():
        for j, n in enumerate(members):
            pos[n] = (j - (len(members) - 1) / 2.0, -d)

    width = max(len(m) for m in layers.values()) if layers else 1
    depth = max(layers) if layers else 1
    fig, ax = plt.subplots(figsize=(max(6, 1.6 * width), max(4, 0.6 * depth)))
    producer = {}
    for n, e in enumerate(eqns):
        for v in e.outvars:
            producer[id(v)] = n
    for n, e in enumerate(eqns):
        x, y = pos[n]
        shape = getattr(e.outvars[0].aval, "shape", ())
        ax.text(x, y, f"{e.primitive.name}\n{tuple(shape)}", ha="center",
                va="center", fontsize=6.5, family="monospace",
                bbox=dict(boxstyle="round,pad=0.25", fc="#e8eef7", ec="#4a6a9d", lw=0.7))
        for v in e.invars:
            if id(v) in producer:
                x0, y0 = pos[producer[id(v)]]
                ax.add_patch(FancyArrowPatch((x0, y0 - 0.18), (x, y + 0.18),
                                             arrowstyle="-|>", mutation_scale=7,
                                             color="#999", lw=0.6))
    ax.set_xlim(-width / 2 - 1, width / 2 + 1)
    ax.set_ylim(-depth - 1, 1)
    ax.axis("off")
    ax.set_title((title or f"jaxpr: {len(jaxpr.jaxpr.eqns)} eqns")
                 + (" (head shown)" if truncated else ""), fontsize=9)
    fig.tight_layout()
    fig.savefig(save_path, dpi=130)
    plt.close(fig)
    return save_path
