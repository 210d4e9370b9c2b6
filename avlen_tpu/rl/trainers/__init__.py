from avlen_tpu.rl.trainers.base import BaseRLTrainer
from avlen_tpu.rl.trainers.avnav import AVNavTrainer
from avlen_tpu.rl.trainers.savi import SaviTrainer
from avlen_tpu.rl.trainers.interactive import InteractiveDDPPOTrainer
from avlen_tpu.rl.trainers.avwan import AVWanTrainer

__all__ = [
    "BaseRLTrainer",
    "AVNavTrainer",
    "SaviTrainer",
    "InteractiveDDPPOTrainer",
    "AVWanTrainer",
]
