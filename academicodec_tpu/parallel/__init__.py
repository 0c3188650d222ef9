from academicodec_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
)
from academicodec_tpu.parallel.sequence import (
    TimeShardedSoundStream,
    TimeShardedVQVAE,
    shard_time,
    time_sharding,
)
