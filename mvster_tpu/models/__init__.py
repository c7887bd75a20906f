from mvster_tpu.models.mvs4net import MVS4Net, MVS4NetConfig
from mvster_tpu.models.losses import mvs4net_loss, blend_loss
