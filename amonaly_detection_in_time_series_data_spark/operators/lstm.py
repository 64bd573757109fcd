"""ML1 — the reference's LSTM autoencoder, inference math in pure numpy.

Reference architecture (src/models/deep_learning_models.py:6-94):

- encoder: 2-layer LSTM (input_dim -> hidden_dim=128, batch_first)
- ``encoder_fc``: Linear hidden_dim -> embedding_dim=64 applied to the
  LAST timestep of the encoder LSTM's top layer
- ``decoder_fc``: Linear embedding_dim -> hidden_dim; the result is
  repeated seq_len times to form the decoder input sequence
- decoder: 2-layer LSTM (hidden_dim -> hidden_dim), zero initial state
- ``output_fc``: Linear hidden_dim -> input_dim per timestep

Hyperparameters per the reference config.py:25-30 (seq_len 24, embedding
64, hidden 128, 2 layers; dropout 0.2 is a TRAIN-time regularizer —
inference runs with dropout disabled, exactly like ``model.eval()``).

torch is not installable in this environment, so the forward pass is
re-derived from the published LSTM equations with torch's exact
conventions (gate order i,f,g,o in the stacked weight matrices; two
bias vectors b_ih + b_hh; layer l>0 consumes layer l-1's hidden
sequence): for each t,

    gates = x_t @ W_ih^T + b_ih + h_{t-1} @ W_hh^T + b_hh
    i, f, g, o = sigmoid, sigmoid, tanh, sigmoid of the 4 gate slices
    c_t = f * c_{t-1} + i * g        h_t = o * tanh(c_t)

A torch state_dict maps 1:1 onto :meth:`LSTMAEModel.from_state` (same
key names), so weights trained elsewhere drop straight in; here the
weights come from :func:`init_lstm_ae` (seeded Glorot-uniform init, the
same distribution torch uses at reset_parameters) or a persisted npz
checkpoint (:func:`~.artifacts.save_lstm_ae`).

Spark shape: the model is a few MB of numpy arrays, broadcast once;
scoring is Arrow-batched ``mapInPandas`` — a pure map, no shuffle, the
same slot :func:`~.inference.sequence_reconstruction_scores` uses for
the linear tier. Per-sequence score = mean squared error over all
seq_len*input_dim elements, matching the reference's
``nn.MSELoss(reduction='mean')`` criterion (main.py:23) applied
per-sequence at scoring time (main.py:228-231).

At 100 TB: batch matmuls run under executor-local BLAS on Arrow batches;
cost is O(rows * L * (f*H + H^2) * layers) with zero Python-per-row
overhead and zero shuffle — the scoring stage pipelines into whatever
lineage produced the sequences.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically stable two-sided form
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    ex = np.exp(x[~pos])
    out[~pos] = ex / (1.0 + ex)
    return out


def lstm_cell_step(
    x: np.ndarray,
    h: np.ndarray,
    c: np.ndarray,
    w_ih: np.ndarray,
    w_hh: np.ndarray,
    b_ih: np.ndarray,
    b_hh: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """One LSTM cell step for a batch. torch layout: ``w_ih`` is
    (4H, in), ``w_hh`` is (4H, H), biases (4H,), gate order i|f|g|o.

    x: (n, in), h/c: (n, H) -> returns (h', c') each (n, H)."""
    gates = x @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    hidden = w_hh.shape[1]
    i = _sigmoid(gates[:, 0 * hidden : 1 * hidden])
    f = _sigmoid(gates[:, 1 * hidden : 2 * hidden])
    g = np.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = _sigmoid(gates[:, 3 * hidden : 4 * hidden])
    c2 = f * c + i * g
    h2 = o * np.tanh(c2)
    return h2, c2


def _run_lstm(x: np.ndarray, layers: list[dict]) -> np.ndarray:
    """Multi-layer LSTM over a batch of sequences, zero initial state.

    x: (n, L, in) -> hidden sequence of the TOP layer, (n, L, H).
    ``layers``: per-layer dicts with w_ih/w_hh/b_ih/b_hh in torch
    layout. Inference only — inter-layer dropout is identity."""
    n, seq_len, _ = x.shape
    seq = x
    for layer in layers:
        hidden = layer["w_hh"].shape[1]
        h = np.zeros((n, hidden), dtype=np.float64)
        c = np.zeros((n, hidden), dtype=np.float64)
        outs = np.empty((n, seq_len, hidden), dtype=np.float64)
        for t in range(seq_len):
            h, c = lstm_cell_step(
                seq[:, t, :], h, c,
                layer["w_ih"], layer["w_hh"], layer["b_ih"], layer["b_hh"],
            )
            outs[:, t, :] = h
        seq = outs
    return seq


class LSTMAEModel:
    """Inference-only LSTM autoencoder with the reference's topology.

    ``state`` is a flat dict of numpy arrays keyed exactly like the
    torch state_dict of the reference module (``encoder_lstm.weight_ih_l0``,
    ``encoder_fc.weight``, ...), so checkpoints are interchangeable."""

    def __init__(self, state: dict[str, np.ndarray]):
        self.state = {k: np.asarray(v, dtype=np.float64) for k, v in state.items()}
        self.n_layers = 1 + max(
            int(k.split("_l")[-1])
            for k in self.state
            if k.startswith("encoder_lstm.weight_ih_l")
        )
        self.hidden_dim = self.state["encoder_lstm.weight_hh_l0"].shape[1]
        self.embedding_dim = self.state["encoder_fc.weight"].shape[0]
        self.input_dim = self.state["encoder_lstm.weight_ih_l0"].shape[1]

    def _layers(self, prefix: str) -> list[dict]:
        s = self.state
        return [
            {
                "w_ih": s[f"{prefix}.weight_ih_l{l}"],
                "w_hh": s[f"{prefix}.weight_hh_l{l}"],
                "b_ih": s[f"{prefix}.bias_ih_l{l}"],
                "b_hh": s[f"{prefix}.bias_hh_l{l}"],
            }
            for l in range(self.n_layers)
        ]

    def forward(self, x: np.ndarray) -> np.ndarray:
        """x: (n, L, input_dim) -> reconstruction, same shape."""
        s = self.state
        n, seq_len, _ = x.shape
        enc = _run_lstm(x, self._layers("encoder_lstm"))
        last = enc[:, -1, :]  # (n, H) — last timestep, top layer
        embedding = last @ s["encoder_fc.weight"].T + s["encoder_fc.bias"]
        inflated = embedding @ s["decoder_fc.weight"].T + s["decoder_fc.bias"]
        # repeat the inflated embedding seq_len times (reference: unsqueeze
        # + repeat) as the decoder LSTM's input sequence
        dec_in = np.repeat(inflated[:, None, :], seq_len, axis=1)
        dec = _run_lstm(dec_in, self._layers("decoder_lstm"))
        return dec @ s["output_fc.weight"].T + s["output_fc.bias"]

    def reconstruction_errors(self, x: np.ndarray) -> np.ndarray:
        """Per-sequence mean squared error over all L*f elements —
        the reference's MSELoss(reduction='mean') per sequence."""
        if x.size == 0:
            return np.empty((0,), dtype=np.float64)
        resid = self.forward(x) - x
        return (resid * resid).mean(axis=(1, 2))


def init_lstm_ae(
    input_dim: int,
    hidden_dim: int = 128,
    embedding_dim: int = 64,
    n_layers: int = 2,
    seed: int = 0,
) -> LSTMAEModel:
    """Seeded random init with torch's reset_parameters distribution
    (uniform(-1/sqrt(H), 1/sqrt(H)) for every LSTM tensor; Kaiming-style
    uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the Linear heads).
    Defaults mirror the reference config.py:27-29."""
    rng = np.random.default_rng(seed)
    state: dict[str, np.ndarray] = {}

    def lstm(prefix: str, in_dim: int) -> None:
        k = 1.0 / np.sqrt(hidden_dim)
        for l in range(n_layers):
            d_in = in_dim if l == 0 else hidden_dim
            state[f"{prefix}.weight_ih_l{l}"] = rng.uniform(
                -k, k, (4 * hidden_dim, d_in)
            )
            state[f"{prefix}.weight_hh_l{l}"] = rng.uniform(
                -k, k, (4 * hidden_dim, hidden_dim)
            )
            state[f"{prefix}.bias_ih_l{l}"] = rng.uniform(-k, k, 4 * hidden_dim)
            state[f"{prefix}.bias_hh_l{l}"] = rng.uniform(-k, k, 4 * hidden_dim)

    def linear(prefix: str, out_dim: int, in_dim: int) -> None:
        k = 1.0 / np.sqrt(in_dim)
        state[f"{prefix}.weight"] = rng.uniform(-k, k, (out_dim, in_dim))
        state[f"{prefix}.bias"] = rng.uniform(-k, k, out_dim)

    lstm("encoder_lstm", input_dim)
    linear("encoder_fc", embedding_dim, hidden_dim)
    linear("decoder_fc", hidden_dim, embedding_dim)
    lstm("decoder_lstm", hidden_dim)
    linear("output_fc", input_dim, hidden_dim)
    return LSTMAEModel(state)
