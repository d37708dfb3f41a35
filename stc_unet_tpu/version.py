__version__ = '0.1.0'


def parse_version_info(version_str: str):
    parts = []
    for x in version_str.split('.'):
        if x.isdigit():
            parts.append(int(x))
        else:
            parts.append(x)
    return tuple(parts)


version_info = parse_version_info(__version__)


def digit_version(version_str: str, length: int = 4):
    """Convert a version string into a comparable tuple of integers
    (≙ reference ``mmseg/__init__.py:13-50``; pre-releases order
    dev < alpha < beta < rc < final < post).
    """
    import warnings

    from packaging.version import parse

    version = parse(version_str)
    assert version.release, f'failed to parse version {version_str}'
    release = list(version.release)[:length]
    if len(release) < length:
        release = release + [0] * (length - len(release))
    if version.is_prerelease:
        mapping = {'a': -3, 'b': -2, 'rc': -1}
        val = -4
        if version.pre:
            if version.pre[0] not in mapping:
                warnings.warn(f'unknown prerelease version {version.pre[0]}, '
                              'version checking may go wrong')
            else:
                val = mapping[version.pre[0]]
            release.extend([val, version.pre[-1]])
        else:
            release.extend([val, 0])
    elif version.is_postrelease:
        release.extend([1, version.post])
    else:
        release.extend([0, 0])
    return tuple(release)
