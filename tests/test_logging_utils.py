"""get_root_logger regression: the work dir must be created even when the
process-wide logger already has handlers (a second Trainer in one process,
or any test that ran before this one). Reference behavior:
det3d/torchie/trainer/trainer.py init_logger always os.makedirs first."""
import logging

from sessd_tpu.utils.logging import get_root_logger


def test_work_dir_created_on_early_return(tmp_path):
    logger = logging.getLogger("sessd_tpu")
    first = tmp_path / "first"
    get_root_logger(str(first))
    assert first.is_dir()
    assert logger.handlers  # file+stream handlers attached

    # second call with a NEW work dir takes the early-return path —
    # the dir must still be created for json/checkpoint writers
    second = tmp_path / "second"
    out = get_root_logger(str(second))
    assert out is logger
    assert second.is_dir()
    (second / "log.json").open("a").close()
