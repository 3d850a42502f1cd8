"""Host-side I/O, logging, and download utilities.

TPU-native rebuild of the reference utilities (see /root/reference
``studiosr/utils/helpers.py``): same public surface (``imread``/``imwrite``
BGR<->RGB via cv2, streaming ``download``, Google-Drive ``gdown_and_extract``,
``Logger``, ``get_image_files``, ``count_parameters``) re-expressed for a JAX
stack — ``get_device`` returns the JAX default backend, ``count_parameters``
counts pytree leaves, and the Google-Drive client is implemented directly on
``requests`` (no gdown dependency).
"""

from __future__ import annotations

import logging
import os
import re
import tempfile
import zipfile
from typing import List, Optional

import numpy as np

__all__ = [
    "get_device",
    "download",
    "gdown_and_extract",
    "download_gdrive",
    "imread",
    "imwrite",
    "Logger",
    "get_image_extensions",
    "get_image_files",
    "count_parameters",
    "enable_compilation_cache",
]


def get_device() -> str:
    """Return the JAX default backend name ("tpu", "gpu", or "cpu").

    Analog of the reference's cuda-else-cpu helper (helpers.py:16-17).
    """
    import jax

    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        return "cpu"


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache.

    Benchmark images come in many distinct shapes; caching compiled
    executables across processes makes repeated evaluation cheap.
    """
    import jax

    cache_dir = path or os.environ.get(
        "STUDIOSR_COMPILE_CACHE", os.path.join(tempfile.gettempdir(), "studiosr_tpu_xla_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax
        pass


def check_tree_shapes(restored, skeleton, context: str = "checkpoint") -> None:
    """Validate every restored leaf's shape against the model skeleton.

    ``flax.serialization.from_bytes`` only validates tree KEYS: a checkpoint
    saved under a differently-sized config restores wrong-shaped arrays
    silently and explodes much later inside the jitted apply with an opaque
    XLA error. Every loader must call this right after ``from_bytes`` so
    config drift fails loudly at load time (Trainer resume and the zoo /
    CLI ``--ckpt`` route both do)."""
    import jax

    for (path, r), (_, t) in zip(
        jax.tree_util.tree_flatten_with_path(restored)[0],
        jax.tree_util.tree_flatten_with_path(skeleton)[0],
    ):
        if np.shape(r) != np.shape(t):
            raise ValueError(
                f"{context} shape mismatch at {jax.tree_util.keystr(path)}: "
                f"saved {np.shape(r)} vs model {np.shape(t)} — model config drift?"
            )


def download(src: str, dst: str, chunk_size: int = 1 << 20) -> None:
    """Stream a URL to a local file with a progress bar (helpers.py:20-29)."""
    import requests
    from tqdm import tqdm

    response = requests.get(src, stream=True, timeout=60)
    response.raise_for_status()
    total_size = int(response.headers.get("content-length", 0))
    progress = tqdm(total=total_size, unit="B", unit_scale=True, desc=os.path.basename(dst))
    tmp = dst + ".part"
    with open(tmp, "wb") as f:
        for data in response.iter_content(chunk_size):
            progress.update(len(data))
            f.write(data)
    progress.close()
    os.replace(tmp, dst)


_GDRIVE_URL = "https://drive.google.com/uc?export=download"


def download_gdrive(id: str, output: str) -> str:
    """Download a (possibly large) public Google-Drive file by id.

    Uses ``gdown`` when installed (most robust against Drive endpoint
    changes); otherwise falls back to a direct requests implementation that
    handles the confirm-token redirect for large files.
    """
    try:
        import gdown  # type: ignore

        gdown.download(id=id, output=output, quiet=False)
        return output
    except ImportError:
        pass

    import requests

    session = requests.Session()
    response = session.get(_GDRIVE_URL, params={"id": id}, stream=True, timeout=60)
    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token is None and b"text/html" in response.headers.get("content-type", "").encode():
        # Newer Drive endpoints embed the confirm form in the HTML body.
        body = response.text
        m = re.search(r'name="confirm" value="([^"]+)"', body)
        uuid = re.search(r'name="uuid" value="([^"]+)"', body)
        action = re.search(r'action="([^"]+)"', body)
        if m and action:
            params = {"id": id, "confirm": m.group(1), "export": "download"}
            if uuid:
                params["uuid"] = uuid.group(1)
            response = session.get(action.group(1), params=params, stream=True, timeout=60)
    elif token is not None:
        response = session.get(_GDRIVE_URL, params={"id": id, "confirm": token}, stream=True, timeout=60)
    response.raise_for_status()
    if b"text/html" in response.headers.get("content-type", "").encode():
        # Still an interstitial (quota page, virus-scan page with a form
        # layout the regexes above missed): committing the HTML body as the
        # output file would defeat the .part safeguard and make every rerun
        # fail later with an unrelated BadZipFile. Fail here, loudly.
        raise IOError(
            f"Google Drive returned an HTML page instead of file {id!r} "
            "(quota exceeded or confirm-form layout changed); install "
            "gdown for the robust client"
        )
    tmp = output + ".part"
    with open(tmp, "wb") as f:
        for chunk in response.iter_content(1 << 20):
            if chunk:
                f.write(chunk)
    os.replace(tmp, output)
    return output


def gdown_and_extract(id: str, save_dir: str) -> None:
    """Download a Google-Drive zip by id and extract it (helpers.py:32-37)."""
    with tempfile.TemporaryDirectory() as temp_dir:
        zip_path = os.path.join(temp_dir, "tmp.zip")
        download_gdrive(id=id, output=zip_path)
        with zipfile.ZipFile(zip_path, "r") as zip_ref:
            zip_ref.extractall(save_dir)


def imread(path: str) -> np.ndarray:
    """Read an image as RGB uint8 HWC (helpers.py:40-44)."""
    import cv2

    image = cv2.imread(path, cv2.IMREAD_COLOR)
    if image is None:
        raise FileNotFoundError(f"could not read image: {path}")
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)


def imwrite(path: str, image: np.ndarray) -> bool:
    """Write an RGB uint8 HWC image (helpers.py:46-49)."""
    import cv2

    image = cv2.cvtColor(np.asarray(image), cv2.COLOR_RGB2BGR)
    return bool(cv2.imwrite(path, image))


class Logger:
    """File/console logger matching the reference Logger (helpers.py:52-92)."""

    def __init__(
        self,
        log_file: Optional[str] = None,
        log_level: int = logging.INFO,
        use_console: bool = False,
    ) -> None:
        self.logger = logging.getLogger(f"studiosr_tpu.{log_file or 'console'}")
        self.logger.setLevel(log_level)
        self.logger.handlers.clear()
        self.logger.propagate = False

        if log_file:
            file_handler = logging.FileHandler(log_file)
            file_handler.setLevel(log_level)
            file_handler.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
            self.logger.addHandler(file_handler)

        if use_console or not log_file:
            console_handler = logging.StreamHandler()
            console_handler.setLevel(log_level)
            console_handler.setFormatter(logging.Formatter("%(message)s"))
            self.logger.addHandler(console_handler)

    def log(self, level: int, message: str) -> None:
        self.logger.log(level, message)

    def debug(self, message: str) -> None:
        self.logger.debug(message)

    def info(self, message: str) -> None:
        self.logger.info(message)

    def warning(self, message: str) -> None:
        self.logger.warning(message)

    def error(self, message: str) -> None:
        self.logger.error(message)

    def critical(self, message: str) -> None:
        self.logger.critical(message)


def get_image_extensions() -> List[str]:
    return [".bmp", ".jpeg", ".jpg", ".jpe", ".jp2", ".png", ".webp", ".tiff", ".tif"]


def get_image_files(root: str) -> List[str]:
    """Recursively collect image files under ``root``, sorted (helpers.py:99-106).

    Returns paths RELATIVE to ``root`` (for flat directories these equal the
    reference's bare file names): the reference's bare-name walk produces
    names that cannot be joined back onto the root for nested directories —
    a FileNotFoundError the first time a zip extracts with a subfolder.
    AppleDouble junk (``__MACOSX/``, ``._*``) that rides Google-Drive zips is
    skipped — the files match image extensions but are not decodable images.
    """
    extensions = set(get_image_extensions())
    image_files = []
    for _root, _dirs, files in os.walk(root):
        _dirs[:] = [d for d in _dirs if d != "__MACOSX"]
        for f in files:
            if f.startswith("._"):
                continue
            if os.path.splitext(f)[1].lower() in extensions:
                image_files.append(os.path.relpath(os.path.join(_root, f), root))
    return sorted(image_files)


def count_parameters(params) -> int:
    """Count parameters in a JAX pytree (analog of helpers.py:109-110).

    Accepts either a raw pytree of arrays or a model wrapper exposing
    ``.params``.
    """
    import jax

    if hasattr(params, "params"):
        params = params.params
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(leaf.shape) if hasattr(leaf, "shape") else 1 for leaf in leaves))


def tree_size_bytes(params) -> int:
    """Total bytes of a parameter pytree."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(leaf.size * leaf.dtype.itemsize for leaf in leaves if hasattr(leaf, "size")))
