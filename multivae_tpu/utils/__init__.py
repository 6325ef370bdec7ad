"""Utilities: terminal colors, run-directory layout, progress."""

from .colors import (
    get_color_list,
    print_command,
    print_error,
    print_result,
    print_subtitle,
    print_text,
    print_title,
)
from .filehandling import (
    create_dir,
    create_dir_structure,
    get_str_experiments,
    model_checkpoint_dir,
    model_log_dir,
)

__all__ = [
    "create_dir",
    "create_dir_structure",
    "get_color_list",
    "get_str_experiments",
    "model_checkpoint_dir",
    "model_log_dir",
    "print_command",
    "print_error",
    "print_result",
    "print_subtitle",
    "print_text",
    "print_title",
]
