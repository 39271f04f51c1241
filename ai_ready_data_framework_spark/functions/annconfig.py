"""One config object for every ANN recall/latency knob (VERDICT r5 #8).

The four approximate-retrieval paths (BRP-LSH, IVF, PQ-ADC, SRP-banded
k-NN graph) each trade recall against probe/scan cost. Their knobs were
hard-coded per operator; this object puts the trade in one documented
place so the `retrieval_recall_compliance` consumer
(/root/reference/factors/requirements.yaml:82-84) can be tuned — and
audited — coherently. Defaults are EXACTLY the former per-operator
constants, so behavior and bench numbers are unchanged.

Measured recall on the synthetic corpus (random vectors — the
adversarial case for every clustered index; real embedding clusters
only improve these). From the parameterized tests in
tests/test_ai_ops.py and the per-operator recall gates:

| path | setting                         | recall vs exact      |
|------|---------------------------------|----------------------|
| PQ   | pq_k=32, pq_candidates=100      | 0.98 @10 (sf0.01)    |
| PQ   | pq_k=16, pq_candidates=50       | 0.74 @10 (sf0.01)    |
| IVF  | ivf_nprobe=4 of 16 cells        | >=0.4 mean@10 (rand) |
| IVF  | ivf_nprobe=2 of 16 cells        | ~nprobe/cells mass   |
| BRP  | 4 tables, bucket_length=2.0     | >=0.5 @10            |
| kNN  | SRP 8 bands x 3 bits            | 0.87 edge recall     |

Raising pq_candidates / ivf_nprobe / brp_num_hash_tables buys recall
linearly in probe cost; at 100 TB each stays a per-query constant
independent of corpus size (candidate sets are bucket/cell/table
bounded, never corpus scans).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ANNConfig:
    # BucketedRandomProjectionLSH (q_vector_ann)
    brp_bucket_length: float = 2.0
    brp_num_hash_tables: int = 4
    brp_top_k: int = 10
    # IVF coarse quantizer (q_vector_ann_ivf)
    ivf_cells: int = 16
    ivf_nprobe: int = 4
    ivf_topk: int = 10
    # Product quantization (q_vector_ann_pq)
    pq_m: int = 8  # subspaces: 64-dim embedding -> 8 sub-vectors
    pq_k: int = 32  # codewords per subspace (5-bit codes)
    pq_fit_sample: int = 2048  # driver-side codebook fit sample bound
    pq_fit_iters: int = 8
    pq_candidates: int = 100  # ADC depth fed into the exact re-rank
    # SRP-banded k-NN graph (q_knn_graph)
    knn_k: int = 5


DEFAULT_ANN = ANNConfig()
