from mvster_tpu.dist.mesh import make_data_mesh, shard_batch_spec
from mvster_tpu.dist.train_step import make_train_step, make_eval_step, create_train_state, TrainState
