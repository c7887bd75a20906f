from mvster_tpu.train.schedules import make_lr_schedule
from mvster_tpu.train.checkpoint import CheckpointManager
from mvster_tpu.train.metrics import depth_metrics, DictAverageMeter
