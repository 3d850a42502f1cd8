from studiosr_tpu.zoo.translate import TranslationReport, load_torch_state_dict, translate_state_dict

__all__ = ["TranslationReport", "load_torch_state_dict", "translate_state_dict", "fetch"]


def fetch(file_name: str, url: str = None, gdrive_id: str = None, model_dir: str = "pretrained") -> str:
    """Resolve a zoo artifact to a local path, downloading on first use.

    Mirrors the reference's per-model caching under ``./pretrained``
    (e.g. ``swinir.py:432-439``, ``hat.py:584-590``).
    """
    import os

    from studiosr_tpu.utils.helpers import download, download_gdrive

    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, file_name)
    if not os.path.exists(path):
        if url is not None:
            download(url, path)
        elif gdrive_id is not None:
            download_gdrive(id=gdrive_id, output=path)
        else:
            raise FileNotFoundError(f"{path} not present and no source given")
    return path
