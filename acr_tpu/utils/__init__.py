from acr_tpu.utils.meters import AverageMeter, AverageMeterDict, StageTimer
from acr_tpu.utils.profiling import profile_trace
from acr_tpu.utils.session import ConfigSession
