from armnet_tpu.parallel.mesh import make_mesh, parse_mesh_spec
from armnet_tpu.parallel.sharding import batch_sharding, state_shardings, table_spec
from armnet_tpu.parallel.embedding_parallel import (
    sharded_embedding_bag, sharded_embedding_bag_a2a)
