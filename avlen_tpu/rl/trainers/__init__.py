from avlen_tpu.rl.trainers.base import BaseRLTrainer
from avlen_tpu.rl.trainers.avnav import AVNavTrainer
from avlen_tpu.rl.trainers.savi import SaviTrainer

__all__ = ["BaseRLTrainer", "AVNavTrainer", "SaviTrainer"]
