"""Version metadata (reference: nasbench_asr/version.py)."""

import pathlib
import subprocess

__version__ = '0.1.0'
version = __version__


def _git(*args):
    try:
        out = subprocess.run(
            ['git', *args], cwd=pathlib.Path(__file__).parent,
            capture_output=True, text=True, timeout=5)
        return out.stdout.strip() if out.returncode == 0 else None
    except (OSError, subprocess.TimeoutExpired):
        return None


commit = _git('rev-parse', 'HEAD')
repo = _git('remote', 'get-url', 'origin')
has_repo = commit is not None
