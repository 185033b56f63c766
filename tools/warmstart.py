"""Compact warm-start snapshots of the long-run flagship checkpoint.

The 2026-08-18 08:08 VM restart restored the repo from git and destroyed
every gitignored orbax milestone (3 GB each, `results/**/model-*/` in
.gitignore) — 58k steps of training lost. This tool is the insurance:

  snapshot: newest results/long_run/model-N  ->  warmstart.npz
      the EMA tree ONLY, as bf16 (uint16 views) in a zip-deflated npz:
      ~340 MB for the 216M-param flagship (both-trees f32 orbax is
      3.4 GB) — small enough to COMMIT, which is the only storage that
      provably survives a VM restore. Plus step and scale_factor.
  restore:  warmstart.npz  ->  results/long_run/model-N
      rebuilds a full orbax milestone around the snapshot: params AND
      EMA both initialised from the snapshot's EMA tree, fresh optimizer
      state (AdamW moments re-warm within a few hundred steps), step
      preserved so the LR schedule continues where it left off.
      train_long's normal resume path then picks it up. Legacy two-tree
      snapshots (pre-2026-08-18T11Z) restore params from their own tree.

Documented precision losses vs the f32 originals: bf16 rounding, raw
params replaced by the EMA point (a trailing average a few hundred steps
behind — training re-converges immediately; sampling, which always uses
EMA, is unaffected). Fine for a disaster-recovery resume (the
alternative is step 0), not a bit-exact checkpoint format — orbax
milestones remain the primary format (reference analogue: torch .pt
milestones, train_uncond_dpm.py:316-329).

Usage:
  python tools/warmstart.py snapshot [results_dir] [out.npz]
  python tools/warmstart.py restore  [results_dir] [in.npz]
Both run host-side (forced CPU): no chip needed, safe while a trainer owns it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tools.watchdog import newest_milestone

DEFAULT_DIR = "results/long_run"


def _build():
    """The exact train_long state structure (tools/train_long.py)."""
    import jax

    from __graft_entry__ import _flagship
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.train.state import TrainState
    from adm_tpu.train.trainer import make_optimizer

    net, res = _flagship()
    model = DDPM(net=net, process_name="const", image_size=(res, res),
                 channels=3, weighting_loss=True, sampling_timesteps=10)
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)

    def make_state():
        params = model.init(jax.random.PRNGKey(0))
        return TrainState.create(params, optimizer.init(params))

    return make_state


def snapshot(results_dir: Path, out: Path) -> None:
    import jax
    import orbax.checkpoint as ocp

    make_state = _build()
    template = jax.eval_shape(make_state)
    ms = newest_milestone(results_dir)
    if not ms:
        raise SystemExit(f"no model-* milestone under {results_dir}")
    ckpt = results_dir / f"model-{ms}"
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(str(ckpt.absolute()), template)

    payload = {
        "step": np.asarray(state.step),
        "scale_factor": np.asarray(state.scale_factor),
    }
    # EMA tree only: params are restored FROM it (see module docstring) —
    # halves the artifact, and deflate shaves another ~22% off the bf16.
    leaves = jax.tree_util.tree_leaves(state.ema_params)
    payload["n_e"] = np.asarray(len(leaves))
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        payload[f"e{i}_dtype"] = np.asarray(str(arr.dtype))
        payload[f"e{i}"] = (
            arr.astype(jax.numpy.bfloat16).view(np.uint16)
            if arr.dtype == np.float32 else arr
        )
    # tmp + atomic rename: a reader (or a git add racing this writer) must
    # never see a torn npz — it is the VM-restore recovery artifact
    # (advisor r4). os.replace is atomic on the same filesystem.
    import os

    tmp = out.with_suffix(".npz.tmp")
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **payload)
    with np.load(tmp, allow_pickle=False) as check:  # validate before swap
        assert "step" in check.files and f"e0" in check.files
    os.replace(tmp, out)
    print(f"[warmstart] wrote {out} from {ckpt.name} "
          f"(step {int(state.step)}, {out.stat().st_size / 1e6:.0f} MB)")


def restore(results_dir: Path, src: Path) -> None:
    import jax
    import orbax.checkpoint as ocp

    from adm_tpu.train.state import TrainState

    z = np.load(src, allow_pickle=False)
    make_state = _build()
    state = jax.jit(make_state)()

    def rebuild(tree, tag):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        assert int(z[f"n_{tag}"]) == len(leaves), (
            f"snapshot has {int(z[f'n_{tag}'])} {tag}-leaves, current "
            f"model {len(leaves)} — model definition changed"
        )
        out = []
        for i, leaf in enumerate(leaves):
            arr = z[f"{tag}{i}"]
            dt = str(z[f"{tag}{i}_dtype"])
            if arr.dtype == np.uint16 and dt == "float32":
                arr = arr.view(jax.numpy.bfloat16).astype(np.float32)
            out.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    ema = rebuild(state.ema_params, "e")
    if "n_p" in z.files:  # legacy two-tree snapshot
        params = rebuild(state.params, "p")
    else:
        params = jax.tree_util.tree_map(
            lambda leaf, e: jax.numpy.asarray(e, dtype=leaf.dtype),
            state.params, ema)
    state = state.replace(
        params=params,
        ema_params=ema,
        step=jax.numpy.asarray(int(z["step"]), state.step.dtype),
        scale_factor=jax.numpy.asarray(
            float(z["scale_factor"]), state.scale_factor.dtype),
    )
    milestone = max(int(z["step"]) // 2000, 1)  # train_long cadence
    dst = (results_dir / f"model-{milestone}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(dst), state, force=True)
    print(f"[warmstart] rebuilt {dst} at step {int(z['step'])} "
          "(fresh optimizer state — moments re-warm in a few hundred steps)")


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in ("snapshot", "restore"):
        print(__doc__, file=sys.stderr)
        return 2
    # host-side either way: never competes with (or waits on) the chip
    import jax

    jax.config.update("jax_platforms", "cpu")
    results_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(DEFAULT_DIR)
    default_npz = results_dir / "warmstart.npz"
    npz = Path(sys.argv[3]) if len(sys.argv) > 3 else default_npz
    if sys.argv[1] == "snapshot":
        snapshot(results_dir, npz)
    else:
        restore(results_dir, npz)
    return 0


if __name__ == "__main__":
    sys.exit(main())
