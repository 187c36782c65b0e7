"""Model representation for the training/inference operators.

The reference ships Keras models to executors as
`{json_architecture, weights}` dicts pickled into closures
(distkeras/utils.py §serialize_keras_model ~L40-60). Keras is not in
this environment (and is not the point); the engine's model contract
is a small, dependency-free numpy MLP with the same serialized shape:
a dict of plain ndarrays that broadcasts cheaply and deserializes
once per Arrow batch.

Anything implementing `forward / loss_grad / get_weights/set_weights`
plugs into the trainers; swapping in a real framework model is a
matter of providing the same four methods inside the mapInPandas
closure.
"""

from __future__ import annotations

import numpy as np


def softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _sgd_epoch(model, x, y, lr, batch_size, rng) -> float:
    """One epoch of minibatch SGD in place; returns mean loss.
    Works for any model honoring the get_weights/loss_grad contract."""
    idx = rng.permutation(len(x))
    losses = []
    for s in range(0, len(x), batch_size):
        b = idx[s : s + batch_size]
        loss, grads = model.loss_grad(x[b], y[b])
        for w, g in zip(model.get_weights(), grads):
            w -= lr * g
        losses.append(loss)
    return float(np.mean(losses)) if losses else 0.0


class MLP:
    """One-hidden-layer MLP classifier (tanh + softmax), pure numpy.

    Deterministic init from `seed` (parity with distkeras/utils.py
    §uniform_weights ~L70, but reproducible).
    """

    def __init__(self, n_in: int, n_hidden: int, n_out: int, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        s1 = np.sqrt(6.0 / (n_in + n_hidden))
        s2 = np.sqrt(6.0 / (n_hidden + n_out))
        self.w1 = rng.uniform(-s1, s1, (n_in, n_hidden))
        self.b1 = np.zeros(n_hidden)
        self.w2 = rng.uniform(-s2, s2, (n_hidden, n_out))
        self.b2 = np.zeros(n_out)

    # -- serialization (broadcast-friendly plain dict) ----------------------

    def get_weights(self) -> list[np.ndarray]:
        return [self.w1, self.b1, self.w2, self.b2]

    def set_weights(self, ws: list[np.ndarray]) -> None:
        self.w1, self.b1, self.w2, self.b2 = [np.asarray(w, dtype=np.float64) for w in ws]

    @staticmethod
    def serialize(ws: list[np.ndarray]) -> dict:
        return {f"w{i}": np.asarray(w, dtype=np.float64) for i, w in enumerate(ws)}

    @staticmethod
    def deserialize(d: dict) -> list[np.ndarray]:
        return [d[f"w{i}"] for i in range(len(d))]

    # -- compute -------------------------------------------------------------

    def forward(self, x: np.ndarray) -> np.ndarray:
        h = np.tanh(x @ self.w1 + self.b1)
        return softmax(h @ self.w2 + self.b2)

    def loss_grad(
        self, x: np.ndarray, y: np.ndarray
    ) -> tuple[float, list[np.ndarray]]:
        """Cross-entropy loss + gradients for integer labels y."""
        n = x.shape[0]
        h = np.tanh(x @ self.w1 + self.b1)
        p = softmax(h @ self.w2 + self.b2)
        loss = float(-np.log(np.clip(p[np.arange(n), y], 1e-12, None)).mean())
        dz2 = p.copy()
        dz2[np.arange(n), y] -= 1.0
        dz2 /= n
        gw2 = h.T @ dz2
        gb2 = dz2.sum(axis=0)
        dh = dz2 @ self.w2.T * (1 - h * h)
        gw1 = x.T @ dh
        gb1 = dh.sum(axis=0)
        return loss, [gw1, gb1, gw2, gb2]

    def sgd_epoch(
        self,
        x: np.ndarray,
        y: np.ndarray,
        lr: float,
        batch_size: int,
        rng: np.random.RandomState,
    ) -> float:
        """One epoch of minibatch SGD in place; returns mean loss."""
        return _sgd_epoch(self, x, y, lr, batch_size, rng)


class ConvNet1D:
    """1-D convnet classifier: valid conv (tanh) → flatten → dense
    softmax, pure numpy.

    Second implementation of the model contract
    (forward / loss_grad / get_weights / set_weights / sgd_epoch),
    proving the trainers are model-agnostic — the analogue of the
    reference's `examples/mnist.ipynb` convnet fed through
    ReshapeTransformer (distkeras/transformers.py §ReshapeTransformer
    ~L135-150): the input vector is treated as a length-`n_in` signal
    with 1 channel.
    """

    def __init__(
        self,
        n_in: int,
        n_filters: int = 8,
        n_out: int = 10,
        kernel: int = 5,
        seed: int = 42,
    ) -> None:
        if kernel > n_in:
            raise ValueError(f"kernel {kernel} wider than input {n_in}")
        rng = np.random.RandomState(seed)
        self.kernel, self.n_in = kernel, n_in
        self.L = n_in - kernel + 1  # valid-conv output length
        sc = np.sqrt(6.0 / (kernel + n_filters))
        sd = np.sqrt(6.0 / (self.L * n_filters + n_out))
        self.wc = rng.uniform(-sc, sc, (kernel, n_filters))
        self.bc = np.zeros(n_filters)
        self.wd = rng.uniform(-sd, sd, (self.L * n_filters, n_out))
        self.bd = np.zeros(n_out)

    # -- serialization -------------------------------------------------------

    def get_weights(self) -> list[np.ndarray]:
        return [self.wc, self.bc, self.wd, self.bd]

    def set_weights(self, ws: list[np.ndarray]) -> None:
        self.wc, self.bc, self.wd, self.bd = [
            np.asarray(w, dtype=np.float64) for w in ws
        ]

    serialize = staticmethod(MLP.serialize)
    deserialize = staticmethod(MLP.deserialize)

    # -- compute -------------------------------------------------------------

    def _windows(self, x: np.ndarray) -> np.ndarray:
        """(n, n_in) → (n, L, kernel) sliding views (no copy)."""
        return np.lib.stride_tricks.sliding_window_view(x, self.kernel, axis=1)

    def forward(self, x: np.ndarray) -> np.ndarray:
        h = np.tanh(self._windows(x) @ self.wc + self.bc)  # (n, L, F)
        return softmax(h.reshape(len(x), -1) @ self.wd + self.bd)

    def loss_grad(
        self, x: np.ndarray, y: np.ndarray
    ) -> tuple[float, list[np.ndarray]]:
        n = x.shape[0]
        win = self._windows(x)                      # (n, L, k)
        h = np.tanh(win @ self.wc + self.bc)        # (n, L, F)
        flat = h.reshape(n, -1)
        p = softmax(flat @ self.wd + self.bd)
        loss = float(-np.log(np.clip(p[np.arange(n), y], 1e-12, None)).mean())
        dzd = p.copy()
        dzd[np.arange(n), y] -= 1.0
        dzd /= n
        gwd = flat.T @ dzd
        gbd = dzd.sum(axis=0)
        dh = (dzd @ self.wd.T).reshape(h.shape) * (1 - h * h)  # (n, L, F)
        gwc = np.einsum("nlk,nlf->kf", win, dh)
        gbc = dh.sum(axis=(0, 1))
        return loss, [gwc, gbc, gwd, gbd]

    def sgd_epoch(self, x, y, lr, batch_size, rng) -> float:
        return _sgd_epoch(self, x, y, lr, batch_size, rng)
