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


def test_text_logger_fires_with_tiny_epochs(tmp_path):
    """Regression: interval gating must use the GLOBAL step count — with
    iters_per_epoch < interval the old per-epoch gate never fired and an
    80-epoch acceptance run trained with zero log lines."""
    from sessd_tpu.utils.logging import TextLogger

    logger = logging.getLogger("sessd_tpu_textlogger_test")
    logger.setLevel(logging.INFO)
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger.addHandler(Capture())
    json_path = tmp_path / "log.json"
    tl = TextLogger(logger, interval=10, total_iters=60,
                    json_path=str(json_path))
    # 10 epochs x 6 iters (the acceptance-run shape)
    for epoch in range(10):
        for it in range(6):
            tl.step(epoch + 1, it, 6, {"loss": 1.0}, lr=1e-3)
    assert len(records) == 6, records  # fires every 10 global steps
    assert json_path.exists()
