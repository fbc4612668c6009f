"""Trainer registry entries (reference `training/registry.py:42-48`)."""
from terrain_diffusion_tpu.training.registry import trainer_registry
from terrain_diffusion_tpu.training.trainers.base import TrainerBase  # noqa: F401
from terrain_diffusion_tpu.training.trainers.diffusion import DiffusionTrainer  # noqa: F401
from terrain_diffusion_tpu.training.trainers.consistency import ConsistencyTrainer  # noqa: F401
from terrain_diffusion_tpu.training.trainers.autoencoder import AutoencoderTrainer  # noqa: F401


@trainer_registry.register("diffusion")
def _diffusion():
    return DiffusionTrainer


@trainer_registry.register("consistency")
def _consistency():
    return ConsistencyTrainer


@trainer_registry.register("autoencoder")
def _autoencoder():
    return AutoencoderTrainer


@trainer_registry.register("gan")
def _gan():
    from terrain_diffusion_tpu.training.trainers.gan import GANTrainer
    return GANTrainer


@trainer_registry.register("perceptron")
def _perceptron():
    from terrain_diffusion_tpu.training.trainers.perceptron import PerceptronTrainer
    return PerceptronTrainer
