from pigeon_tpu.parallel import mesh
from pigeon_tpu.parallel.mesh import (BatchedController, make_mesh,
                                      shard_batch)
