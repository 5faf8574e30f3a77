"""Console + TensorBoard loggers (reference utils/console_logger.py +
utils/tensorboard_logger.py; SURVEY.md SS2.1 "Loggers")."""

from __future__ import annotations

import datetime


class ConsoleLogger:
    """ANSI-colored per-step/per-epoch console lines (reference style)."""

    BOLD = "\033[1m"
    BLUE = "\033[94m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    RED = "\033[91m"
    END = "\033[0m"

    def _time(self) -> str:
        return datetime.datetime.now().strftime("%H:%M:%S")

    def print_epoch_start(self, epoch: int, max_epoch: int) -> None:
        print(f"\n{self.BOLD} > EPOCH: {epoch}/{max_epoch}{self.END}", flush=True)

    def print_train_start(self) -> None:
        print(f"\n{self.BOLD} > TRAINING ({self._time()}){self.END}", flush=True)

    def print_train_step(self, batch_steps: int, step: int, global_step: int,
                         loss_dict: dict, avg_loss_dict: dict | None = None) -> None:
        msg = f"{self.BLUE}   --> STEP: {step}/{batch_steps} -- GLOBAL_STEP: {global_step}{self.END}"
        for k, v in loss_dict.items():
            msg += f" | {k}: {float(v):.5f}"
        print(msg, flush=True)

    def print_eval_start(self) -> None:
        print(f"{self.BOLD} > EVALUATION {self.END}", flush=True)

    def print_epoch_end(self, epoch: int, avg_loss_dict: dict) -> None:
        msg = f"{self.GREEN}   --> EPOCH END -- {epoch} {self.END}"
        for k, v in avg_loss_dict.items():
            msg += f" | avg_{k}: {float(v):.5f}"
        print(msg, flush=True)


class TensorboardLogger:
    """Scalar/figure/audio logging via tensorboardX (no-op if unavailable)."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_dir)
        except Exception:  # pragma: no cover - TB optional
            self.writer = None

    def _scalars(self, scope: str, step: int, d: dict) -> None:
        if self.writer is None:
            return
        for k, v in d.items():
            try:
                self.writer.add_scalar(f"{scope}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def tb_train_iter_stats(self, step: int, stats: dict) -> None:
        self._scalars("TrainIterStats", step, stats)

    def tb_train_epoch_stats(self, step: int, stats: dict) -> None:
        self._scalars("TrainEpochStats", step, stats)

    def tb_eval_stats(self, step: int, stats: dict) -> None:
        self._scalars("EvalStats", step, stats)

    def tb_train_figures(self, step: int, figures: dict) -> None:
        if self.writer is None:
            return
        for k, fig in figures.items():
            self.writer.add_figure(f"TrainFigures/{k}", fig, step)

    def tb_eval_figures(self, step: int, figures: dict) -> None:
        if self.writer is None:
            return
        for k, fig in figures.items():
            self.writer.add_figure(f"EvalFigures/{k}", fig, step)

    def tb_eval_audios(self, step: int, audios: dict, sample_rate: int) -> None:
        if self.writer is None:
            return
        for k, wav in audios.items():
            try:
                self.writer.add_audio(f"EvalAudios/{k}", wav[None, :], step,
                                      sample_rate=sample_rate)
            except Exception:
                # tensorboardX's audio encoder needs soundfile, which may be
                # absent; logging must never take training down
                return

    def tb_model_weights(self, step: int, params) -> None:
        """Per-layer weight histograms + norms (reference
        tb_model_param_stats config flag)."""
        if self.writer is None:
            return
        import jax
        import numpy as np

        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = jax.tree_util.keystr(path).replace("'", "").replace("][", "/") \
                .strip("[]")
            arr = np.asarray(leaf)
            try:
                self.writer.add_scalar(f"ModelParams/{name}/norm",
                                       float(np.linalg.norm(arr)), step)
                self.writer.add_histogram(f"ModelParams/{name}", arr, step)
            except Exception:
                return

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()
