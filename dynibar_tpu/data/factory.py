"""Training-dataset factory: weighted mixtures of scenes/datasets.

Rebuild of reference ibrnet/data_loaders/create_training_dataset.py:41-127:
``train_dataset`` may be a single dataset or a '+'-concatenated list with
per-dataset sampling weights; in distributed mode each process must see a
disjoint sample stream.  Here a dataset is a `sample_batch(rng, ...)`
provider; the mixture picks a provider per step by weight, and process
disjointness comes from folding `jax.process_index()` into the stream seed
(replacing DistributedSampler/DistributedSamplerWrapper).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from dynibar_tpu.config import DynibarConfig

# registry: name -> callable(config, scene) -> provider with
# sample_batch(rng, n_rays, sample_mode) and set_epoch(epoch)
DATASET_REGISTRY: Dict[str, Callable] = {}


def register_dataset(name: str):
  def deco(fn):
    DATASET_REGISTRY[name] = fn
    return fn
  return deco


@register_dataset("monocular")
def _make_monocular(config: DynibarConfig, scene: str):
  from dynibar_tpu.data.monocular import MonocularSceneData
  return MonocularSceneData(config, scene)


class MixtureDataset:
  """Weighted mixture over providers, one sample stream per process."""

  def __init__(self, providers: Sequence, weights: Sequence[float],
               process_index: int = 0):
    assert len(providers) == len(weights) and providers
    self.providers = list(providers)
    w = np.asarray(weights, np.float64)
    self.weights = w / w.sum()
    self.process_index = process_index
    self.num_frames = max(p.num_frames for p in self.providers)

  def set_epoch(self, epoch: int):
    for p in self.providers:
      p.set_epoch(epoch)

  def sample_batch(self, rng: np.random.RandomState, n_rays: int,
                   sample_mode: str = "uniform"):
    # fold process index into the stream so multi-host data-parallel sees
    # disjoint batches (reference used DistributedSampler for this)
    if self.process_index:
      rng = np.random.RandomState(
          (rng.randint(0, 2 ** 31 - 1) * 2654435761
           + self.process_index) % (2 ** 31 - 1))
    idx = rng.choice(len(self.providers), p=self.weights)
    return self.providers[idx].sample_batch(rng, n_rays, sample_mode)


def create_training_dataset(config: DynibarConfig,
                            process_index: Optional[int] = None
                            ) -> MixtureDataset:
  """'name1+name2' datasets with equal weights unless one dataset."""
  names = config.train_dataset.split("+")
  scenes = config.train_scenes or [""]
  providers = []
  for name in names:
    maker = DATASET_REGISTRY.get(name)
    if maker is None:
      raise SystemExit(
          f"error: unknown train_dataset '{name}'; "
          f"registered: {sorted(DATASET_REGISTRY)}")
    for scene in scenes:
      providers.append(maker(config, scene))
  weights = [1.0 / len(providers)] * len(providers)
  if process_index is None:
    try:
      import jax
      process_index = jax.process_index()
    except Exception:
      process_index = 0
  return MixtureDataset(providers, weights, process_index)
