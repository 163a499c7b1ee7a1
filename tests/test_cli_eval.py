"""CLI --eval path integration test (2019 + 2021 modes)."""

import json

import numpy as np
import pytest

from rade_tpu.tools.synth_dataset import generate

TINY_MODEL = {
    "architecture": "AASIST",
    "nb_samp": 4800,
    "first_conv": 128,
    "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
    "gat_dims": [4, 4],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return generate(str(tmp_path_factory.mktemp("la")), n_per_split=10, seed=2)


def test_eval_cli_2019(synth_root, tmp_path, capsys):
    conf = {
        "database_path": str(synth_root) + "/",
        "asv_score_path": str(synth_root / "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"),
        "model_path": "",
        "batch_size": 4,
        "num_epochs": 1,
        "loss": "CCE",
        "track": "LA",
        "eval_output": "eval_scores.txt",
        "model_config": TINY_MODEL,
        "optim_config": {"base_lr": 1e-3},
        "test_config": {"batch_size": 4},
    }
    cpath = tmp_path / "eval.conf"
    cpath.write_text(json.dumps(conf))

    from rade_tpu.main import main

    main(["--config", str(cpath), "--eval", "--output_dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "eval EER:" in out
    score_file = tmp_path / "out" / "eval_scores.txt"
    lines = score_file.read_text().splitlines()
    assert len(lines) == 10
    parts = lines[0].split()
    assert len(parts) == 4 and parts[2] in ("bonafide", "spoof")
    assert (tmp_path / "out" / "t-DCF_EER.txt").exists()


def test_eval_cli_2021(tmp_path, capsys):
    # miniature 2021-DF layout: flac/ + trial file + metadata keys
    from rade_tpu.data.audio_io import write_wav

    rng = np.random.RandomState(0)
    db = tmp_path / "df21"
    (db / "flac").mkdir(parents=True)
    trial_lines, meta_lines = [], []
    for i in range(8):
        utt = f"DF_E_{i:07d}"
        write_wav(db / "flac" / f"{utt}.wav", 0.1 * rng.randn(5000), 16000)
        key = "bonafide" if i % 2 == 0 else "spoof"
        trial_lines.append(f"LA_{i:04d} {utt} nocodec asvspoof A07 {key} - eval")
        meta_lines.append(f"LA_{i:04d} {utt} nocodec asvspoof A07 {key} - eval")
    (db / "ASVspoof2021.DF.cm.eval.trl.txt").write_text("\n".join(trial_lines) + "\n")
    keyfile = tmp_path / "trial_metadata.txt"
    keyfile.write_text("\n".join(meta_lines) + "\n")

    conf = {
        "database_path": str(db) + "/",
        "asv_score_path": "",
        "model_path": "",
        "batch_size": 4,
        "num_epochs": 1,
        "loss": "CCE",
        "track": "LA",
        "is_eval_2021": True,
        "key_file_2021": str(keyfile),
        "eval_output": "scores21.txt",
        "model_config": TINY_MODEL,
        "optim_config": {"base_lr": 1e-3},
        "test_config": {"batch_size": 4},
    }
    cpath = tmp_path / "eval21.conf"
    cpath.write_text(json.dumps(conf))

    from rade_tpu.main import main

    main(["--config", str(cpath), "--eval", "--output_dir", str(tmp_path / "out21")])
    out = capsys.readouterr().out
    assert "2021-DF EER:" in out
    score_file = tmp_path / "out21" / "scores21.txt"
    lines = score_file.read_text().splitlines()
    assert len(lines) == 8 and len(lines[0].split()) == 2
    assert (tmp_path / "out21" / "report_2021df_codec.md").exists()
