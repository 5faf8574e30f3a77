"""Experiment folder management (reference utils/generic_utils.py:
create_experiment_folder, copy_config_file, git hash capture)."""

from __future__ import annotations

import datetime
import os
import subprocess


def get_git_commit() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True, check=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)),
                              ).stdout.strip()
    except Exception:
        return "unknown"


def create_experiment_folder(root_path: str, run_name: str) -> str:
    date_str = datetime.datetime.now().strftime("%B-%d-%Y_%I+%M%p")
    commit = get_git_commit()
    out = os.path.join(root_path, f"{run_name}-{date_str}-{commit}")
    os.makedirs(out, exist_ok=True)
    return out


def count_parameters(params) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
