"""Device mesh ownership and batch/param sharding (reference §2.5 replacement).

The reference's distributed backend is HF Accelerate over NCCL DDP
(reference trainer.py:188-201). The TPU-native equivalent is a named
``jax.sharding.Mesh`` with three axes:

* ``data``  — batch (DP) axis; NT-Xent negatives are all-gathered over it.
* ``fsdp``  — optional parameter-sharding (ZeRO-style) axis.
* ``model`` — tensor-parallel axis for the scaled configs (ViT-L/14 +
  GPT-2 Large, SigLIP + Llama-3-8B): attention heads and MLP hidden sharded.

Multi-slice deployments add the outer ``dcn`` axis (data parallelism across
slices over the data-center network): batches are additionally split over it
and gradient all-reduces ride DCN — XLA's SPMD partitioner schedules the ICI
(in-slice) reductions first, then the cross-slice reduce-scatter/all-gather,
which is the bandwidth-optimal order (scaling-book recipe). The factory
accepts explicit device lists so tests can build 8-device CPU meshes.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

AXES = ("dcn", "data", "fsdp", "model", "seq")


class MeshContext:
    """Owns the device mesh and the canonical sharding constructors.

    The innermost ``seq`` axis is context parallelism for long-sequence
    stage-2 runs (training/cp_step.py): parameters are replicated over it
    (no sharding rule mentions it) and the caption sequence dim is split
    across it inside shard_map. Size 1 (the default) makes it inert.
    """

    def __init__(
        self,
        data: int = -1,
        fsdp: int = 1,
        model: int = 1,
        dcn: int = 1,
        seq: int = 1,
        devices: Optional[Sequence[Any]] = None,
    ):
        devices = list(devices) if devices is not None else jax.devices()
        n = len(devices)
        if data == -1:
            if n % (dcn * fsdp * model * seq) != 0:
                raise ValueError(
                    f"{n} devices not divisible by dcn*fsdp*model*seq="
                    f"{dcn * fsdp * model * seq}"
                )
            data = n // (dcn * fsdp * model * seq)
        if dcn * data * fsdp * model * seq != n:
            raise ValueError(
                f"Mesh {dcn}x{data}x{fsdp}x{model}x{seq} does not match {n} devices"
            )
        device_array = np.asarray(devices).reshape(dcn, data, fsdp, model, seq)
        self.mesh = Mesh(device_array, AXES)
        self.shape: Dict[str, int] = dict(zip(AXES, (dcn, data, fsdp, model, seq)))
        logger.info("Mesh created: %s over %d %s devices", self.shape, n, devices[0].platform)

    @classmethod
    def from_config(cls, config, devices=None) -> "MeshContext":
        return cls(
            data=config.get("mesh.data", -1),
            fsdp=config.get("mesh.fsdp", 1),
            model=config.get("mesh.model", 1),
            dcn=config.get("mesh.dcn", 1),
            seq=config.get("mesh.seq", 1),
            devices=devices,
        )

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    @property
    def data_parallel_size(self) -> int:
        return self.shape["dcn"] * self.shape["data"] * self.shape["fsdp"]

    # -- shardings ---------------------------------------------------------------

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading (batch) dim split over dcn+data+fsdp; rest replicated."""
        return self.sharding(("dcn", "data", "fsdp"))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    def shard_batch(self, batch):
        """Device-put a host batch pytree with batch-dim sharding."""
        return jax.tree.map(
            lambda x: jax.device_put(x, self.batch_sharding), batch
        )

    def __enter__(self):
        self._ctx = self.mesh
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)
