"""Bloom filter, skyline, edit-1 blocking, A/B z-test, Gram matrix —
algorithmic invariants beyond the DuckDB gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest










class TestAbZtest:
    def test_z_zero_when_arms_identical(self, ray_session):
        from searchengine_ray.pipelines.queries import round_half_away

        # symmetric contingency: z must be exactly 0
        xa, na, xb, nb = 50, 100, 50, 100
        p1, p2 = xa / na, xb / nb
        pp = (xa + xb) / (na + nb)
        z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))
        assert round_half_away(z, 6) == 0.0
