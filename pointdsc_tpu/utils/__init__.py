from pointdsc_tpu.utils.timer import Timer, AverageMeter
from pointdsc_tpu.utils.seed import set_seed
