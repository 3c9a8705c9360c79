from tpupose.utils.logging import (
    printS, printE, printW, printT, printM, master_only, line, time_check,
)
from tpupose.utils.meters import AverageMeter, MetricDict
from tpupose.utils.seed import set_seed

__all__ = [
    "printS", "printE", "printW", "printT", "printM",
    "master_only", "line", "time_check",
    "AverageMeter", "MetricDict", "set_seed",
]
