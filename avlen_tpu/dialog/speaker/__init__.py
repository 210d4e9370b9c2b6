from avlen_tpu.dialog.speaker.speaker import Speaker
from avlen_tpu.dialog.speaker.vocab import Vocabulary

__all__ = ["Speaker", "Vocabulary"]
