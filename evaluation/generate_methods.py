"""Enumerate EPD disaggregation layouts for an instance budget
(reference: evaluation/slo_attainment/generate_methods.py:25-80).

Families: epd (colocated), ep_d, ed_p, e_p_d. Emits cluster node-spec
fragments consumable by the serve entrypoint's `cluster.nodes` config.
"""
import argparse
import itertools
import json
from dataclasses import asdict, dataclass, field
from typing import Dict, List

NODE_KINDS = ("E", "P", "D", "EP", "ED", "PD", "EPD")


@dataclass
class DisaggregationMethod:
    counts: Dict[str, int]

    @property
    def name(self) -> str:
        return "_".join(f"{k.lower()}{v}" for k, v in self.counts.items() if v)

    def to_cluster_nodes(self) -> List[dict]:
        return [{"node_type": k, "n_replicas": v}
                for k, v in self.counts.items() if v]


def search_disaggregation_methods(max_n_instances: int) -> Dict[str, Dict[int, list]]:
    """family → n_instances → methods. A layout is valid iff every stage
    (E, P, D) is covered by at least one node."""
    families = {"epd": {}, "ep_d": {}, "ed_p": {}, "e_p_d": {}}
    for n in range(1, max_n_instances + 1):
        for fam in families:
            families[fam][n] = []
        for combo in itertools.product(range(n + 1), repeat=len(NODE_KINDS)):
            if sum(combo) != n:
                continue
            counts = dict(zip(NODE_KINDS, combo))
            has = {s: any(v and s in k for k, v in counts.items())
                   for s in "EPD"}
            if not all(has.values()):
                continue
            method = DisaggregationMethod(counts)
            only = {k for k, v in counts.items() if v}
            if only == {"EPD"}:
                families["epd"][n].append(method)
            elif only == {"E", "P", "D"}:
                families["e_p_d"][n].append(method)
            elif only == {"EP", "D"}:
                families["ep_d"][n].append(method)
            elif only == {"ED", "P"}:
                families["ed_p"][n].append(method)
    return families


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-instances", type=int, default=4)
    ap.add_argument("--family", default=None,
                    choices=[None, "epd", "ep_d", "ed_p", "e_p_d"])
    args = ap.parse_args()
    methods = search_disaggregation_methods(args.max_instances)
    out = {}
    for fam, per_n in methods.items():
        if args.family and fam != args.family:
            continue
        out[fam] = {n: [{"name": m.name, "nodes": m.to_cluster_nodes()}
                        for m in ms] for n, ms in per_n.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
