"""S3/S4 — model and scaler artifact round-trip.

Reference behavior reproduced:

- S3  checkpoint save during training + reload-best-at-the-end
      (reference: main.py:48-55 — ModelCheckpoint(save_best_only=True)
      then load the saved weights before scoring).
- S4  persistable scaler (reference: main.py:177-179 — joblib dump of
      the fitted MinMaxScaler).

Spark-first shapes:

- MLlib models/pipelines already carry an MLWritable artifact format
  (a directory of parquet + JSON metadata, readable from any executor
  or a different cluster); :func:`save_ml` / :func:`load_ml` are the
  engine's blessed entry points so callers don't touch class internals.
- The driver-fit :class:`~.inference.LinearAEModel` persists as a
  single ``.npz`` (mean + components) — tiny, dependency-free, and
  broadcastable after reload exactly like a freshly fit model.
- :class:`BestCheckpoint` reproduces save_best_only semantics for any
  npz-persistable model: ``offer(loss, model)`` keeps the artifact of
  the lowest loss seen; ``load_best`` returns that model.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .inference import LinearAEModel


# ---------------------------------------------------------------------------
# S4 — MLlib artifact round-trip
# ---------------------------------------------------------------------------

def save_ml(model, path: str) -> None:
    """Persist any MLWritable (PipelineModel, MinMaxScalerModel, ...)."""
    model.write().overwrite().save(path)


def load_ml(path: str, cls=None):
    """Reload an MLlib artifact. ``cls`` defaults to PipelineModel —
    the type :func:`~.scaling.minmax_scale_ml` returns."""
    if cls is None:
        from pyspark.ml import PipelineModel as cls  # noqa: N813
    return cls.load(path)


# ---------------------------------------------------------------------------
# S3 — LinearAE (npz) round-trip + best-checkpoint semantics
# ---------------------------------------------------------------------------

def save_linear_ae(model: LinearAEModel, path: str) -> None:
    np.savez(path, mean=model.mean, components=model.components)


def load_linear_ae(path: str) -> LinearAEModel:
    with np.load(path) as z:
        return LinearAEModel(z["mean"].copy(), z["components"].copy())


def save_lstm_ae(model, path: str) -> None:
    """Persist an ML1 :class:`~.lstm.LSTMAEModel` as one npz whose keys
    are exactly the torch state_dict names (``encoder_lstm.weight_ih_l0``
    ...), so a checkpoint exported from the reference's torch module
    (state_dict -> numpy -> npz) loads here unchanged."""
    np.savez(path, **model.state)


def load_lstm_ae(path: str):
    from .lstm import LSTMAEModel

    with np.load(path) as z:
        return LSTMAEModel({k: z[k].copy() for k in z.files})


class BestCheckpoint:
    """save_best_only checkpointing for the driver-fit model tier.

    ``offer(loss, model)`` persists the model iff ``loss`` improves on
    the best seen (strictly lower); ``load_best()`` reloads that
    artifact. The best loss survives process restarts via a JSON
    sidecar, mirroring the reference's on-disk checkpoint file.
    """

    def __init__(self, directory: str, saver=None, loader=None):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._meta_path = os.path.join(directory, "best.json")
        self._model_path = os.path.join(directory, "best_model.npz")
        # default (saver, loader) keep the original LinearAE behavior;
        # pass (save_lstm_ae, load_lstm_ae) for the ML1 tier — see
        # lstm_best_checkpoint
        self._saver = saver or save_linear_ae
        self._loader = loader or load_linear_ae

    @property
    def best_loss(self) -> float | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return json.load(f)["loss"]

    def offer(self, loss: float, model: LinearAEModel) -> bool:
        best = self.best_loss
        if best is not None and loss >= best:
            return False
        # crash-safe ordering: stage both files, publish the model first,
        # the meta sidecar LAST — a crash mid-offer leaves either the old
        # (artifact, loss) pair intact or the new artifact with the old
        # sidecar (harmless: the next offer re-compares against the old,
        # higher loss and re-publishes), never a loss claiming a model
        # that isn't on disk.
        tmp_model = self._model_path + ".tmp.npz"
        tmp_meta = self._meta_path + ".tmp"
        self._saver(model, tmp_model)
        with open(tmp_meta, "w") as f:
            json.dump({"loss": float(loss)}, f)
        os.replace(tmp_model, self._model_path)
        os.replace(tmp_meta, self._meta_path)
        return True

    def load_best(self):
        if not os.path.exists(self._model_path):
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._loader(self._model_path)


def lstm_best_checkpoint(directory: str) -> BestCheckpoint:
    """save_best_only checkpointing for the ML1 LSTM-AE tier: the same
    crash-safe BestCheckpoint protocol over the torch-state_dict-keyed
    npz format, so :func:`~.lstm.train_lstm_ae` mirrors the reference's
    train loop (main.py:48-55) end to end."""
    return BestCheckpoint(directory, saver=save_lstm_ae, loader=load_lstm_ae)
