"""Logger mirroring habitat.logger behavior (console + optional file handler,
habitat-lab-dialog/habitat/core/logging.py)."""

import logging
import sys


class _Logger(logging.Logger):
    def __init__(self):
        super().__init__("avlen_tpu", logging.INFO)
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
        self.addHandler(handler)

    def add_filehandler(self, path: str) -> None:
        fh = logging.FileHandler(path)
        fh.setFormatter(logging.Formatter("%(asctime)-15s %(message)s"))
        self.addHandler(fh)


logger = _Logger()
