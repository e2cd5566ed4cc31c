"""Ellipse model fitting (direct conic least squares, numpy) providing the
``skimage.measure.fit.EllipseModel`` surface the reference subclasses."""

import numpy as np


class EllipseModel:
    """Direct least-squares conic ellipse fit (Fitzgibbon-style constrained
    eigen problem) with geometric residuals.

    ``params`` is ``[xc, yc, a, b, theta]`` like skimage's.
    """

    def __init__(self):
        self.params = None

    def estimate(self, data):
        data = np.asarray(data, np.float64)
        if data.ndim != 2 or data.shape[1] != 2 or len(data) < 5:
            return False
        x, y = data[:, 0], data[:, 1]
        # center/scale for conditioning
        mx, my = x.mean(), y.mean()
        s = max(np.abs(np.stack([x - mx, y - my])).max(), 1e-12)
        u, v = (x - mx) / s, (y - my) / s
        # conic A u^2 + B uv + C v^2 + D u + E v + F = 0 with the ellipse
        # constraint 4AC - B^2 = 1 enforced via the generalised eigenproblem
        d1 = np.stack([u * u, u * v, v * v], axis=1)
        d2 = np.stack([u, v, np.ones_like(u)], axis=1)
        s1 = d1.T @ d1
        s2 = d1.T @ d2
        s3 = d2.T @ d2
        try:
            t = -np.linalg.solve(s3, s2.T)
        except np.linalg.LinAlgError:
            return False
        m = s1 + s2 @ t
        cinv = np.array([[0, 0, 0.5], [0, -1, 0], [0.5, 0, 0]])
        mm = cinv @ m
        eigval, eigvec = np.linalg.eig(mm)
        # ellipse solution: the eigenvector with 4AC - B^2 > 0
        cond = 4 * eigvec[0] * eigvec[2] - eigvec[1] ** 2
        ok = np.where(np.isreal(eigval) & (cond > 0))[0]
        if len(ok) == 0:
            return False
        a1 = np.real(eigvec[:, ok[0]])
        coef = np.concatenate([a1, t @ a1])          # A, B, C, D, E, F
        A, B, C, D, E, F = coef
        # conic -> geometric parameters
        den = B * B - 4 * A * C
        if den >= 0:
            return False
        uc = (2 * C * D - B * E) / den
        vc = (2 * A * E - B * D) / den
        # semi-axes
        num = 2 * (A * E * E + C * D * D + F * B * B - B * D * E - 4 * A * C * F)
        root = np.sqrt((A - C) ** 2 + B * B)
        a2 = num / (den * ((A + C) + root))
        b2 = num / (den * ((A + C) - root))
        if a2 <= 0 or b2 <= 0:
            return False
        wa, wb = np.sqrt(a2), np.sqrt(b2)
        theta = 0.5 * np.arctan2(B, A - C) if B != 0 else \
            (0.0 if A < C else np.pi / 2)
        if wa < wb:
            wa, wb = wb, wa
            theta += np.pi / 2
        theta = ((theta + np.pi / 2) % np.pi) - np.pi / 2
        self.params = [uc * s + mx, vc * s + my, wa * s, wb * s, theta]
        return True

    def predict_xy(self, t, params=None):
        xc, yc, a, b, theta = params if params is not None else self.params
        ct, st = np.cos(theta), np.sin(theta)
        x = xc + a * ct * np.cos(t) - b * st * np.sin(t)
        y = yc + a * st * np.cos(t) + b * ct * np.sin(t)
        return np.stack([x, y], axis=-1)

    def residuals(self, data):
        """Orthogonal distance to the ellipse: coarse parameter sweep plus
        Newton refinement of the per-point closest ellipse parameter."""
        data = np.asarray(data, np.float64)
        xc, yc, a, b, theta = self.params
        ct, st = np.cos(theta), np.sin(theta)
        # rotate points into the ellipse frame
        dx = data[:, 0] - xc
        dy = data[:, 1] - yc
        px = dx * ct + dy * st
        py = -dx * st + dy * ct

        tt = np.linspace(0, 2 * np.pi, 64, endpoint=False)
        ex = a * np.cos(tt)[None]                    # (1, T)
        ey = b * np.sin(tt)[None]
        d2 = (px[:, None] - ex) ** 2 + (py[:, None] - ey) ** 2
        t0 = tt[np.argmin(d2, axis=1)]

        for _ in range(8):
            cs, sn = np.cos(t0), np.sin(t0)
            fx, fy = a * cs, b * sn
            # d/dt of squared distance, and second derivative, for Newton
            g = (fx - px) * (-a * sn) + (fy - py) * (b * cs)
            h = (a * sn) ** 2 + (b * cs) ** 2 \
                + (fx - px) * (-a * cs) + (fy - py) * (-b * sn)
            t0 = t0 - g / np.where(np.abs(h) > 1e-12, h, 1e-12)
        cs, sn = np.cos(t0), np.sin(t0)
        return np.hypot(a * cs - px, b * sn - py)
