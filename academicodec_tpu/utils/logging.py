"""Rank-0 training logger: timestamped text log + optional TensorBoard.

Reference counterpart: academicodec/utils.py:94-166 (Logger) and the
hificodec trainer's raw SummaryWriter. TensorBoard is optional — gated on
tensorboardX / tensorflow availability, absent in minimal environments.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax


def is_primary() -> bool:
    return jax.process_index() == 0


class Logger:
    def __init__(self, save_dir: str, tensorboard: bool = False, args: Any = None):
        self.save_dir = save_dir
        self.is_primary = is_primary()
        self.tb_writer = None
        if not self.is_primary:
            return
        os.makedirs(save_dir, exist_ok=True)
        log_dir = os.path.join(save_dir, "logs")
        os.makedirs(log_dir, exist_ok=True)
        self._fh = open(os.path.join(log_dir, "log.txt"), "a")
        if args is not None:
            cfg_dir = os.path.join(save_dir, "configs")
            os.makedirs(cfg_dir, exist_ok=True)
            with open(os.path.join(cfg_dir, "args.json"), "w") as f:
                try:
                    json.dump(args if isinstance(args, dict) else vars(args), f,
                              indent=2, default=str)
                except TypeError:
                    f.write(str(args))
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self.tb_writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self.log_info("tensorboard requested but tensorboardX unavailable")

    def log_info(self, info: str, check_primary: bool = True) -> None:
        if self.is_primary or not check_primary:
            print(info)
        if self.is_primary:
            stamp = time.strftime("%Y-%m-%d-%H-%M")
            self._fh.write(f"{stamp}: {info}\n")
            self._fh.flush()

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self.is_primary and self.tb_writer is not None:
            self.tb_writer.add_scalar(tag, value, step)

    def close(self) -> None:
        if self.is_primary:
            self._fh.close()
            if self.tb_writer is not None:
                self.tb_writer.close()
