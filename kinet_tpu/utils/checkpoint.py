"""Checkpointing + shape-adapting resume surgery
(reference: src/train.py:167-282, 312-357).

Orbax-backed save/restore of {params, opt_state, step, epoch, best_stats}.
The reference's transfer-learning state-dict surgery (train.py:176-256):
when a resumed tensor's shape differs from the model's, it is sliced or
tiled to fit (query embeds repeated, class_embed rows sliced to the first
`num_classes+1`, optional eos-neuron shift). `adapt_params` reproduces
that per-leaf.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def _adapt_leaf(name: str, ckpt: np.ndarray, model: np.ndarray,
                resume_shift_neuron: bool = False) -> np.ndarray:
    ckpt = np.asarray(ckpt)
    if ckpt.shape == model.shape:
        return ckpt
    out = np.array(model)
    # class head: keep the first rows (reference train.py:216-243 slices
    # class_embed to num_classes+1 and optionally shifts the eos neuron)
    if "class_embed" in name and ckpt.ndim >= 1:
        n = min(ckpt.shape[-1], model.shape[-1])
        if ckpt.ndim == 1:
            out[:n] = ckpt[:n]
            if resume_shift_neuron and ckpt.shape[-1] > model.shape[-1]:
                out[-1] = ckpt[-1]  # eos neuron from the checkpoint's last
        else:
            out[..., :n] = ckpt[..., : n]
        return out
    # query embeds: tile or slice rows (reference train.py:199-214)
    if "query_embed" in name:
        n_model = model.shape[0]
        n_ckpt = ckpt.shape[0]
        if n_ckpt >= n_model:
            return ckpt[:n_model]
        reps = -(-n_model // n_ckpt)
        return np.tile(ckpt, (reps,) + (1,) * (ckpt.ndim - 1))[:n_model]
    # generic: slice the overlapping region
    slices = tuple(slice(0, min(a, b)) for a, b in zip(ckpt.shape, model.shape))
    out[slices] = ckpt[slices]
    return out


def adapt_params(ckpt_params: Any, model_params: Any,
                 resume_shift_neuron: bool = False) -> Any:
    """Per-leaf shape adaptation of a restored param tree onto the model's
    structure; leaves missing from the checkpoint keep the model's init."""
    def walk(ck, mo, prefix=""):
        if isinstance(mo, dict):
            out = {}
            for k, v in mo.items():
                if isinstance(ck, dict) and k in ck:
                    out[k] = walk(ck[k], v, f"{prefix}/{k}")
                else:
                    out[k] = v
            return out
        if ck is None:
            return mo
        return jnp.asarray(
            _adapt_leaf(prefix, np.asarray(ck), np.asarray(mo),
                        resume_shift_neuron)
        )

    return walk(ckpt_params, model_params)


class CheckpointManager:
    """Epoch checkpoints + best-metric bookkeeping
    (reference train.py:312-357: checkpoint.pth per epoch,
    checkpoint_epoch_{e}.pth at save_model_interval, checkpoint_best_{m}.pth)."""

    def __init__(self, output_dir: str, save_model_interval: int = 5):
        self.dir = Path(output_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_model_interval = save_model_interval
        self.best = {}
        self._ckptr = ocp.PyTreeCheckpointer() if ocp is not None else None

    def _save(self, path: Path, payload):
        if self._ckptr is None:  # pragma: no cover
            raise RuntimeError("orbax not available")
        self._ckptr.save(path.resolve(), payload, force=True)

    def save_preempt(self, state, epoch: int):
        """Mid-epoch preemption checkpoint: recorded as `epoch - 1` so the
        requeued run re-enters (re-runs) the interrupted epoch —
        load_for_resume restarts at restored_epoch + 1. Matches the
        reference's coarse-grained submitit resume (run_with_submitit.py:
        53-67); without this the remaining steps of the interrupted epoch
        would be silently skipped. Writes only the rolling `checkpoint`
        (no interval/best files: the state is mid-epoch)."""
        self._save(
            self.dir / "checkpoint",
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
                "epoch": epoch - 1,
            },
        )

    def save_epoch(self, state, epoch: int, eval_stats: Optional[dict] = None):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": epoch,
        }
        self._save(self.dir / "checkpoint", payload)
        if self.save_model_interval and epoch % self.save_model_interval == 0:
            self._save(self.dir / f"checkpoint_epoch_{epoch}", payload)
        if eval_stats:
            for metric, value in eval_stats.items():
                if value is None:
                    continue
                if value > self.best.get(metric, -np.inf):
                    self.best[metric] = value
                    self._save(self.dir / f"checkpoint_best_{metric}", payload)

    def restore(self, path: Optional[str] = None):
        p = Path(path) if path else self.dir / "checkpoint"
        if not p.exists():
            return None
        return self._ckptr.restore(p.resolve())


def splice_mask_head(params: Any, mask_ckpt_params: Any) -> Any:
    """Overwrite the mask-head subtrees (bbox_attention / mask_head) with a
    second checkpoint's, where shapes match (reference train.py:245-254)."""

    def walk(mo, ck, in_head=False, prefix=""):
        if isinstance(mo, dict):
            out = {}
            for k, v in mo.items():
                head = in_head or k in ("bbox_attention", "mask_head")
                sub = ck.get(k) if isinstance(ck, dict) else None
                out[k] = walk(v, sub, head, f"{prefix}/{k}")
            return out
        if (
            in_head
            and ck is not None
            and np.asarray(ck).shape == np.asarray(mo).shape
        ):
            return jnp.asarray(np.asarray(ck))
        return mo

    return walk(params, mask_ckpt_params)


def load_for_resume(cfg, model_params, tx):
    """Resume/transfer (reference train.py:167-282). Returns
    (params, opt_state or None, start_epoch)."""
    params = model_params
    opt_state = None
    start_epoch = int(cfg.start_epoch)
    restored = None
    if cfg.resume:
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(str(Path(cfg.resume).resolve()))
        params = adapt_params(
            restored["params"], model_params, cfg.resume_shift_neuron
        )
    # mask-head splice from a SECOND checkpoint (reference train.py:245-254;
    # the reference only applies it under --resume, we also honor it when
    # training the mask head from a scratch-frozen detector)
    if cfg.get("masks") and cfg.get("load_mask_head_from_model"):
        ckptr = ocp.PyTreeCheckpointer()
        mask_ckpt = ckptr.restore(
            str(Path(cfg.load_mask_head_from_model).resolve())
        )
        params = splice_mask_head(params, mask_ckpt["params"])
    if restored is not None and cfg.resume_optim and "opt_state" in restored:
        opt_state = restored["opt_state"]
        start_epoch = int(restored.get("epoch", 0)) + 1
    return params, opt_state, start_epoch
