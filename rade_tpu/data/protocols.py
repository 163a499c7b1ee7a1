"""ASVspoof protocol-file parsing.

Same semantics as the reference's `genSpoof_list`
(`/root/reference/src/data_utils.py:62-104`):

- 2019 rows: ``SPEAKER KEY - ATTACK LABEL`` (5 space-separated columns);
  label ``bonafide`` -> 1, anything else -> 0.
- 2021 rows: multi-column metadata; the file key is column 1 (index 1),
  with single-column fallback.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple, Union

PathLike = Union[str, Path]


def parse_protocol_labeled(path: PathLike) -> Tuple[Dict[str, int], List[str]]:
    """Train/dev protocol -> (labels {key: 0|1}, ordered file list)."""
    labels: Dict[str, int] = {}
    files: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            _, key, _, _, label = line.split(" ")
            files.append(key)
            labels[key] = 1 if label == "bonafide" else 0
    return labels, files


def parse_protocol_eval(path: PathLike) -> List[str]:
    """2019 eval protocol -> ordered file list (labels ignored)."""
    files: List[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            _, key, _, _, _ = line.split(" ")
            files.append(key)
    return files


def parse_protocol_2021(path: PathLike) -> List[str]:
    """2021 protocol/metadata -> file list from column 1 (fallback: column 0)."""
    files: List[str] = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            files.append(parts[1] if len(parts) >= 2 else parts[0])
    return files


def parse_protocol_attacks(path: PathLike) -> Dict[str, str]:
    """2019 protocol -> {key: attack_id} (column 3; '-' for bonafide)."""
    attacks: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) == 5:
                attacks[parts[1]] = parts[3]
    return attacks
