"""CLI surface: config loading and batch dispatch (no heavy generation)."""
import numpy as np

from actalker_tpu import cli


def test_load_config_py_and_yaml(tmp_path):
    py = tmp_path / "conf.py"
    py.write_text("cfg = {'num_inference_steps': 7, 'fps': 10.0,\n"
                  "       'unet_cls': 'x.v10_wo_audio.U'}\n")
    c = cli.load_config(str(py))
    assert c.num_inference_steps == 7 and c.fps == 10.0
    assert c.ablate == ("audio",)

    yml = tmp_path / "conf.yaml"
    yml.write_text("num_inference_steps: 9\n")
    assert cli.load_config(str(yml)).num_inference_steps == 9


def test_batch_dispatch(tmp_path, monkeypatch):
    yml = tmp_path / "conf.yaml"
    yml.write_text("num_inference_steps: 2\n")
    calls = []
    monkeypatch.setattr(
        cli, "_run_single",
        lambda cfg, args, gate, pipes, interactive, t0=None: calls.append(
            (args.ref, args.audio, interactive)))
    cli.main(["--config", str(yml), "--batch",
              "--ref", "a.png,b.png,c.png", "--audio", "x.mp3", "--mode", "0"])
    assert [c[0] for c in calls] == ["a.png", "b.png", "c.png"]
    assert all(c[1] == "x.mp3" for c in calls)      # shared audio broadcast
    assert not any(c[2] for c in calls)             # no interactive loop
