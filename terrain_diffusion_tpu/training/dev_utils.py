"""Dataset/stage visualizers (reference `training/dev_utils/*` — 10 slider
UIs; here one headless CLI that renders PNG contact sheets per dataset so
they work over SSH/CI).

Usage:
    python -m terrain_diffusion_tpu.training.dev_utils --config cfg.cfg \
        --section train_dataset --out sheet.png
"""
from __future__ import annotations

import click
import numpy as np


def render_contact_sheet(samples: list[dict], out_path: str,
                         max_channels: int = 8):
    """Grid: one row per sample, one column per channel of image/cond_img."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = len(samples)
    panels = []
    for s in samples:
        cols = []
        img = np.asarray(s["image"])
        for c in range(min(img.shape[-1], max_channels)):
            cols.append((f"img[{c}]", img[..., c]))
        if s.get("cond_img") is not None:
            ci = np.asarray(s["cond_img"])
            for c in range(min(ci.shape[-1], max_channels - len(cols))):
                cols.append((f"cond[{c}]", ci[..., c]))
        panels.append(cols)
    ncols = max(len(p) for p in panels)
    fig, axes = plt.subplots(rows, ncols, figsize=(2.2 * ncols, 2.2 * rows),
                             squeeze=False)
    for r, cols in enumerate(panels):
        for c in range(ncols):
            ax = axes[r][c]
            ax.axis("off")
            if c < len(cols):
                name, data = cols[c]
                ax.imshow(data, cmap="terrain")
                if r == 0:
                    ax.set_title(name, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


@click.command()
@click.option("--config", "config_path", required=True,
              type=click.Path(exists=True))
@click.option("--section", default="train_dataset")
@click.option("--n", type=int, default=4)
@click.option("--out", default="dataset_sheet.png")
@click.option("-o", "--override", "overrides", multiple=True)
def main(config_path, section, n, out, overrides):
    """Render a PNG contact sheet of dataset samples."""
    from terrain_diffusion_tpu.training.registry import (
        apply_overrides, build_registry, load_config, resolve)

    build_registry()
    config = load_config(config_path)
    apply_overrides(config, overrides)
    resolved = resolve(config)
    ds = resolved[section]
    samples = [ds[i] for i in range(n)]
    render_contact_sheet(samples, out)
    print(f"wrote {out} ({n} samples)")


if __name__ == "__main__":
    main()
