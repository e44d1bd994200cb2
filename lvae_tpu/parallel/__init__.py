from lvae_tpu.parallel.mesh import (
    init_distributed, get_data_mesh, shard_batch, replicate, data_sharding,
    replicated_sharding, process_count, process_index, local_batch_slice,
    fast_device_get,
)
from lvae_tpu.parallel.spatial import get_2d_mesh, image_sharding, \
    spatial_eval
from lvae_tpu.parallel import dist_utils
