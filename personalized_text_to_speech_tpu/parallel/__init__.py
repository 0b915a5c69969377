"""Device-mesh parallelism: mesh construction and sharding specs.

TPU-native replacement for the reference's DDP/NCCL runtime
(reference ``finetune_speaker_v2.py:50-69,144-145``): instead of one process
per GPU with bucketed all-reduce, a single program lays out a
``jax.sharding.Mesh`` and ``jit`` emits XLA collectives over ICI from the
sharding annotations.
"""

from personalized_text_to_speech_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
from personalized_text_to_speech_tpu.parallel import sp, tp  # noqa: F401
from personalized_text_to_speech_tpu.parallel.sp import (  # noqa: F401
    shard_batch_sp,
    sp_batch_shardings,
)
