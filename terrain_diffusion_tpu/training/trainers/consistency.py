"""Consistency (sCM/TrigFlow) distillation trainer
(reference `trainers/consistency.py:17-404`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from terrain_diffusion_tpu.nn import torch_compat
from terrain_diffusion_tpu.training.diffusion_core import (
    ConsistencyLossConfig,
    consistency_loss,
    make_optimizer,
    make_train_step,
)
from terrain_diffusion_tpu.training.trainers.base import TrainerBase, ema_for


class ConsistencyTrainer(TrainerBase):
    def __init__(self, config: dict, resolved: dict):
        self.config = config
        self.resolved = resolved
        tr = config.get("training", {})
        model_cfg = config.get("model", {})

        # student initialized from the pretrained teacher
        main_path = model_cfg.get("main_path")
        guide_path = model_cfg.get("guide_path")
        if resolved.get("model") is not None and not main_path:
            self.model = resolved["model"]
            self.teacher_params = None
        else:
            self.model, self.teacher_params = torch_compat.load_model(main_path)
        self.guide = None
        self.guide_params = None
        if guide_path:
            self.guide, self.guide_params = torch_compat.load_model(guide_path)
        self.lr_sched = resolved["lr_sched"]

        self.loss_cfg = ConsistencyLossConfig(
            sigma_data=float(tr.get("sigma_data", 0.5)),
            P_mean=float(tr.get("P_mean", -1.0)),
            P_std=float(tr.get("P_std", 1.4)),
            guidance_scale=float(model_cfg.get("guidance_scale", 1.0)),
            warmup_steps=int(tr.get("warmup_steps", 10000)),
            loss_groups=tuple(tr["loss_groups"]) if tr.get("loss_groups") else None,
            use_logvar=bool(tr.get("use_logvar", True)),
            const_c=float(tr.get("const_c", 0.1)),
        )
        opt_kwargs = config.get("optimizer", {}).get("kwargs", {})
        self.optimizer = make_optimizer(
            betas=tuple(opt_kwargs.get("betas", (0.9, 0.99))),
            grad_clip=float(tr.get("gradient_clip_val", 100.0)))
        self._step = None  # built lazily once teacher params known

    def set_teacher(self, teacher_params, guide_params=None):
        self.teacher_params = teacher_params
        if guide_params is not None:
            self.guide_params = guide_params

    def _build_step(self):
        """Build the jitted step.  Teacher/guide params are jit ARGUMENTS,
        never closure captures — closed-over params get baked into the HLO
        as constants, which explodes compile payloads (hundreds of MB) and
        breaks remote-compile backends."""
        has_guide = self.guide_params is not None
        guide_model = self.guide or self.model
        import optax

        from terrain_diffusion_tpu.nn.layers import norm_weights_tree

        def step(params, opt_state, batch, key, lr, teacher_params,
                 guide_params):
            def teacher_apply(x, cnoise, cond_inputs):
                return jax.lax.stop_gradient(
                    self.model.apply(teacher_params, x, cnoise, cond_inputs))

            guide_apply = None
            if has_guide:
                def guide_apply(x, cnoise, cond_inputs):  # noqa: F811
                    return jax.lax.stop_gradient(
                        guide_model.apply(guide_params, x, cnoise, cond_inputs))

            def loss_fn(p, b, k):
                return consistency_loss(self.model, p, teacher_apply, b, k,
                                        self.loss_cfg, b["_step"],
                                        guide_apply=guide_apply)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = norm_weights_tree(params)
            metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                       **aux}
            return params, opt_state, metrics

        self._step = jax.jit(step)

    def init_state(self, key, save_dir=None) -> dict:
        if self.teacher_params is not None:
            params = jax.tree.map(jnp.asarray, self.teacher_params)
        else:
            params = self.model.init(key)
            self.teacher_params = params
        # reference re-randomizes the logvar head at distillation start
        # (`trainers/diffusion.py:95-98` load_model_checkpoint)
        params = dict(params)
        params["logvar_linear"] = self.model.init(jax.random.fold_in(key, 1))["logvar_linear"]
        self._build_step()
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "ema": ema_for(params, self.config, save_dir),
        }

    def prepare_batch(self, batch: dict, step: int) -> dict:
        out = {"image": batch["image"], "_step": jnp.int32(step)}
        if "cond_img" in batch and batch.get("cond_img") is not None:
            out["cond_img"] = batch["cond_img"]
        if batch.get("cond_inputs"):
            out["cond_inputs"] = batch["cond_inputs"]
        return out

    def train_step(self, state: dict, batch: dict, key, counters: dict) -> dict:
        lr = self.lr_sched.get(counters["seen"])
        params, opt_state, metrics = self._step(
            state["params"], state["opt_state"],
            self.prepare_batch(batch, counters["step"]), key, jnp.float32(lr),
            self.teacher_params,
            self.guide_params if self.guide_params is not None else {})
        state["params"] = params
        state["opt_state"] = opt_state
        counters["seen"] += int(np.shape(batch["image"])[0])
        counters["step"] += 1
        if state.get("ema") is not None:
            state["ema"].update(params, counters["step"])
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["lr"] = lr
        return metrics
