from .mesh import make_mesh, shard_batch, replicate
from .train_step import make_train_step, TrainState
from .eval_step import make_sharded_episode_runner, pad_streams
