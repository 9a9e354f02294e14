from .mesh import make_mesh, shard_batch, replicate
from .train_step import make_train_step, TrainState
