"""Logger regressions (≙ reference ``mmseg/utils/logger.py`` semantics)."""
import logging
import os
import os.path as osp


def test_log_level_keyword_does_not_create_file(tmp_path, monkeypatch):
    """get_root_logger(log_level=...) must not open a file named after the
    level (regression: cfg.log_level passed positionally as log_file)."""
    monkeypatch.chdir(tmp_path)
    from stc_unet_tpu.utils import get_root_logger
    logger = get_root_logger(log_level='INFO')
    logger.info('probe')
    assert not osp.exists(tmp_path / 'INFO')


def test_log_file_handler(tmp_path):
    from stc_unet_tpu.utils.logger import get_logger
    f = str(tmp_path / 'run.log')
    logger = get_logger('stc_unet_tpu_test_file', log_file=f)
    logger.info('hello-from-test')
    for h in logger.handlers:
        h.flush()
    assert 'hello-from-test' in open(f).read()
