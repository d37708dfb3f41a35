"""Core misc utilities (≙ reference ``mmseg/core/utils/misc.py:2``)."""


def add_prefix(inputs: dict, prefix: str) -> dict:
    """Namespace a loss dict: ``{'loss_ce': v}`` → ``{'decode.loss_ce': v}``."""
    return {f'{prefix}.{name}': value for name, value in inputs.items()}
