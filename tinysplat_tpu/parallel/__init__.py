"""Multi-chip parallelism: mesh construction + sharded training.

The reference framework is strictly single-GPU (SURVEY.md section 2.3: no
torch.distributed / NCCL anywhere in /root/reference). This subsystem is the
TPU-native scaling layer required by the north star: splat parameters live
FSDP-sharded over the whole device mesh, image pixel rows are sharded over the
'tile' mesh axis, cameras are batched over the 'data' axis, and all
communication is XLA collectives over ICI (all_gather forward / psum_scatter
backward, automatically overlapped by the compiler with the surrounding
compute).
"""
from .sharding import make_mesh, state_shardings, shard_state
from .train_step import make_sharded_train_step, make_sharded_render
from .trainer import MeshTrainer, init_distributed

__all__ = [
    "make_mesh",
    "state_shardings",
    "shard_state",
    "make_sharded_train_step",
    "make_sharded_render",
    "MeshTrainer",
    "init_distributed",
]
