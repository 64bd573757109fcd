"""ML1 + ML2 — the reference's LSTM autoencoder: inference math AND the
gradient training loop (numpy BPTT + Adam) in pure numpy.

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


def _run_lstm_cached(
    x: np.ndarray, layers: list[dict]
) -> tuple[np.ndarray, list[dict]]:
    """Forward pass of :func:`_run_lstm` that also returns per-layer
    caches (gate activations, cell states) for BPTT. Same math, same
    outputs; the inference path keeps the cache-free version."""
    n, seq_len, _ = x.shape
    seq = x
    caches: list[dict] = []
    for layer in layers:
        hidden = layer["w_hh"].shape[1]
        h = np.zeros((n, hidden), dtype=np.float64)
        c = np.zeros((n, hidden), dtype=np.float64)
        cache = {
            "x": seq,
            "i": np.empty((n, seq_len, hidden)),
            "f": np.empty((n, seq_len, hidden)),
            "g": np.empty((n, seq_len, hidden)),
            "o": np.empty((n, seq_len, hidden)),
            "c": np.empty((n, seq_len, hidden)),
            "tanh_c": np.empty((n, seq_len, hidden)),
            "h": np.empty((n, seq_len, hidden)),
        }
        for t in range(seq_len):
            gates = (
                seq[:, t, :] @ layer["w_ih"].T + layer["b_ih"]
                + h @ layer["w_hh"].T + layer["b_hh"]
            )
            i = _sigmoid(gates[:, 0 * hidden : 1 * hidden])
            f = _sigmoid(gates[:, 1 * hidden : 2 * hidden])
            g = np.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = _sigmoid(gates[:, 3 * hidden : 4 * hidden])
            c = f * c + i * g
            tc = np.tanh(c)
            h = o * tc
            for k, v in (("i", i), ("f", f), ("g", g), ("o", o),
                         ("c", c), ("tanh_c", tc), ("h", h)):
                cache[k][:, t, :] = v
        caches.append(cache)
        seq = cache["h"]
    return seq, caches


def _lstm_backward(
    dh_out: np.ndarray, caches: list[dict], layers: list[dict]
) -> tuple[np.ndarray, list[dict]]:
    """BPTT through the stacked LSTM. ``dh_out``: gradient w.r.t. the
    TOP layer's hidden sequence, (n, L, H). Returns (dx_seq — gradient
    w.r.t. the bottom layer's input sequence — and per-layer grads
    {w_ih, w_hh, b_ih, b_hh} in torch layout). Standard cell backward:
    through ``h_t = o tanh(c_t)``, ``c_t = f c_{t-1} + i g``, then the
    logistic/tanh gate derivatives onto the pre-activations, whose
    jacobians w.r.t. W_ih/W_hh are the layer input / previous hidden."""
    grads: list[dict] = [None] * len(layers)
    d_upper = dh_out
    for li in range(len(layers) - 1, -1, -1):
        layer, cache = layers[li], caches[li]
        n, seq_len, hidden = cache["h"].shape
        x_seq = cache["x"]
        dW_ih = np.zeros_like(layer["w_ih"])
        dW_hh = np.zeros_like(layer["w_hh"])
        db = np.zeros_like(layer["b_ih"])
        dx_seq = np.zeros_like(x_seq)
        dh_rec = np.zeros((n, hidden))
        dc_rec = np.zeros((n, hidden))
        for t in range(seq_len - 1, -1, -1):
            i = cache["i"][:, t, :]
            f = cache["f"][:, t, :]
            g = cache["g"][:, t, :]
            o = cache["o"][:, t, :]
            tc = cache["tanh_c"][:, t, :]
            dh = d_upper[:, t, :] + dh_rec
            do = dh * tc
            dc = dc_rec + dh * o * (1.0 - tc * tc)
            c_prev = cache["c"][:, t - 1, :] if t > 0 else 0.0
            h_prev = cache["h"][:, t - 1, :] if t > 0 else None
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dc_rec = dc * f
            dgates = np.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=1,
            )
            dW_ih += dgates.T @ x_seq[:, t, :]
            if h_prev is not None:
                dW_hh += dgates.T @ h_prev
            db += dgates.sum(axis=0)
            dx_seq[:, t, :] = dgates @ layer["w_ih"]
            dh_rec = dgates @ layer["w_hh"]
        # b_ih and b_hh are added in the same pre-activation: same grad
        grads[li] = {"w_ih": dW_ih, "w_hh": dW_hh, "b_ih": db, "b_hh": db.copy()}
        d_upper = dx_seq
    return d_upper, grads


def lstm_ae_loss_grads(
    model: LSTMAEModel, x: np.ndarray
) -> tuple[float, dict[str, np.ndarray]]:
    """Full forward + backward of the autoencoder on a batch.

    Returns (loss, grads) where loss is torch's
    ``MSELoss(reduction='mean')`` over ALL batch elements (divides by
    n*L*f) and grads is keyed exactly like the state dict. Dropout is
    deliberately identity (the reference's 0.2 inter-layer dropout is
    a train-time regularizer; omitting it keeps the trainer
    deterministic and the gradient numerically checkable — pinned in
    tests against central differences).
    """
    s = model.state
    n, seq_len, f_dim = x.shape
    enc_layers = model._layers("encoder_lstm")
    dec_layers = model._layers("decoder_lstm")

    enc_out, enc_caches = _run_lstm_cached(x, enc_layers)
    last = enc_out[:, -1, :]
    embedding = last @ s["encoder_fc.weight"].T + s["encoder_fc.bias"]
    inflated = embedding @ s["decoder_fc.weight"].T + s["decoder_fc.bias"]
    dec_in = np.repeat(inflated[:, None, :], seq_len, axis=1)
    dec_out, dec_caches = _run_lstm_cached(dec_in, dec_layers)
    out = dec_out @ s["output_fc.weight"].T + s["output_fc.bias"]

    resid = out - x
    loss = float((resid * resid).mean())

    dout = 2.0 * resid / resid.size
    grads: dict[str, np.ndarray] = {}
    grads["output_fc.weight"] = np.einsum("nlf,nlh->fh", dout, dec_out)
    grads["output_fc.bias"] = dout.sum(axis=(0, 1))
    ddec_out = dout @ s["output_fc.weight"]
    ddec_in, dec_grads = _lstm_backward(ddec_out, dec_caches, dec_layers)
    # the repeated decoder input sums its timestep gradients
    dinflated = ddec_in.sum(axis=1)
    grads["decoder_fc.weight"] = dinflated.T @ embedding
    grads["decoder_fc.bias"] = dinflated.sum(axis=0)
    dembedding = dinflated @ s["decoder_fc.weight"]
    grads["encoder_fc.weight"] = dembedding.T @ last
    grads["encoder_fc.bias"] = dembedding.sum(axis=0)
    dlast = dembedding @ s["encoder_fc.weight"]
    dh_enc = np.zeros_like(enc_out)
    dh_enc[:, -1, :] = dlast
    _, enc_grads = _lstm_backward(dh_enc, enc_caches, enc_layers)
    for prefix, layer_grads in (
        ("encoder_lstm", enc_grads), ("decoder_lstm", dec_grads)
    ):
        for li, lg in enumerate(layer_grads):
            for part in ("w_ih", "w_hh", "b_ih", "b_hh"):
                key = part.replace("w_", "weight_").replace("b_", "bias_")
                grads[f"{prefix}.{key}_l{li}"] = lg[part]
    return loss, grads


class AdamState:
    """torch-convention Adam (betas 0.9/0.999, eps 1e-8, bias-corrected
    first/second moments) over a state dict of numpy arrays."""

    def __init__(self, state: dict[str, np.ndarray], lr: float = 1e-3,
                 betas: tuple[float, float] = (0.9, 0.999), eps: float = 1e-8):
        self.lr, self.betas, self.eps = lr, betas, eps
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in state.items()}
        self.v = {k: np.zeros_like(v) for k, v in state.items()}

    def step(self, state: dict[str, np.ndarray], grads: dict[str, np.ndarray]):
        b1, b2 = self.betas
        self.t += 1
        for k, g in grads.items():
            self.m[k] = b1 * self.m[k] + (1 - b1) * g
            self.v[k] = b2 * self.v[k] + (1 - b2) * (g * g)
            mhat = self.m[k] / (1 - b1 ** self.t)
            vhat = self.v[k] / (1 - b2 ** self.t)
            state[k] -= self.lr * mhat / (np.sqrt(vhat) + self.eps)


def train_lstm_ae(
    x: np.ndarray,
    model: LSTMAEModel | None = None,
    n_epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 64,
    seed: int = 0,
    checkpoint=None,
    shuffle: bool = True,
    drop_last: bool = True,
) -> tuple[LSTMAEModel, list[float]]:
    """ML2 for the LSTM tier — the reference's training loop
    (main.py:20-56) in numpy: Adam(lr=1e-3 per config.py:35), MSE
    mean-reduction, shuffled batches of 64 with drop_last
    (main.py:196), per-epoch loss accumulated as ``loss * batch_n``
    and averaged over the FULL dataset length (main.py:42-44 divides
    by len(dataset) even under drop_last — reproduced), checkpoint
    on strict improvement (save_best_only), best weights reloaded at
    the end (main.py:48-55).

    ``x``: (N, L, f) driver-sampled sequences — training is a
    driver-side loop over a bounded sample by design (the reference
    trains single-node too; the DISTRIBUTED epoch loop for the linear
    tier is operators.inference.fit_linear_ae_epochs, and scoring —
    the data-scale stage — is the broadcast mapInPandas path).
    ``checkpoint``: an :class:`~.artifacts.BestCheckpoint`-shaped
    object built with the lstm saver/loader (see
    ``artifacts.lstm_best_checkpoint``).

    Returns (best-or-final model, per-epoch losses).
    """
    if model is None:
        model = init_lstm_ae(input_dim=x.shape[2])
    n = x.shape[0]
    if n == 0 or (drop_last and n < batch_size and n_epochs > 0):
        raise ValueError(
            f"train_lstm_ae: {n} sequences with batch_size={batch_size} "
            "and drop_last leaves zero batches"
        )
    rng = np.random.default_rng(seed)
    opt = AdamState(model.state, lr=lr)
    losses: list[float] = []
    best_loss = float("inf")
    for _epoch in range(n_epochs):
        order = rng.permutation(n) if shuffle else np.arange(n)
        n_batches = n // batch_size if drop_last else -(-n // batch_size)
        epoch_loss = 0.0
        for b in range(n_batches):
            idx = order[b * batch_size : (b + 1) * batch_size]
            loss, grads = lstm_ae_loss_grads(model, x[idx])
            opt.step(model.state, grads)
            epoch_loss += loss * len(idx)
        avg = epoch_loss / n  # reference divides by len(dataset)
        losses.append(avg)
        if avg < best_loss:
            best_loss = avg
            if checkpoint is not None:
                checkpoint.offer(avg, model)
    if checkpoint is not None and losses:
        model = checkpoint.load_best()
    return model, losses


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
