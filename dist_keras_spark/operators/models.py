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
        idx = rng.permutation(len(x))
        losses = []
        for s in range(0, len(x), batch_size):
            b = idx[s : s + batch_size]
            loss, grads = self.loss_grad(x[b], y[b])
            for w, g in zip(self.get_weights(), grads):
                w -= lr * g
            losses.append(loss)
        return float(np.mean(losses)) if losses else 0.0
