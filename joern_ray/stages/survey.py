"""Per-batch survey combiner — the accumulator pattern (reference
`AstCreationPass.scala:27-72`: per-part partial accumulators merged
associatively).

`survey_partial` turns one node batch into tagged partial rows:
  'm'  METHOD full_name counts     (dup detection + broadcast sizing)
  'td' TYPE_DECL full_name counts  (dup detection)
  'ty' distinct type fqns (;-exploded — TypeNodePass union semantics)
  'ns' distinct namespace-block names
  'ca' CALL/METHOD_REF method_full_name COUNTS — true per-batch call
       counts (value_counts, not distinct-per-batch), so the summed
       totals are real call-site frequencies and the salted join's
       hot-key threshold compares against actual skew
  'rt' distinct return types parsed off METHOD signatures (the TYPE
       dimension needs them for call-site EVAL_TYPE type recovery in
       BOTH link regimes)

The parse stage emits these rows INTO its checkpoint (row_kind=survey),
so the link stage reads a few tiny files instead of re-scanning the node
stream."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def survey_partial(batch: pa.Table, edges: "pa.Table | None" = None) -> pa.Table:
    ks, keys, cs = [], [], []
    labels = batch.column("label")
    # 'am'/'ax': per-batch min/max ARGUMENT count per CALL fqn — the
    # MethodStubCreator CallSummary aggregate (reference
    # `MethodStubCreator.scala:24-70` keeps min/max/num args per distinct
    # unresolved name); final agg takes min of 'am', max of 'ax'.
    if edges is not None and edges.num_rows:
        import pyarrow.compute as _pc

        argvc = (
            edges.filter(_pc.equal(edges.column("pred"), "ARGUMENT"))
            .column("subj")
            .value_counts()
        )
        n_by_subj = dict(
            zip(argvc.field("values").to_pylist(), argvc.field("counts").to_pylist())
        )
        call_rows = batch.filter(_pc.equal(labels, "CALL"))
        mm: dict[str, list[int]] = {}
        for nid, fqn in zip(
            call_rows.column("id").to_pylist(),
            call_rows.column("method_full_name").to_pylist(),
        ):
            if not fqn:
                continue
            n = int(n_by_subj.get(nid, 0))
            cur = mm.get(fqn)
            if cur is None:
                mm[fqn] = [n, n]
            else:
                if n < cur[0]:
                    cur[0] = n
                if n > cur[1]:
                    cur[1] = n
        for fqn, (lo, hi) in mm.items():
            ks.append("am")
            keys.append(fqn)
            cs.append(lo)
            ks.append("ax")
            keys.append(fqn)
            cs.append(hi)
    for kind, lab in (("m", "METHOD"), ("td", "TYPE_DECL")):
        vc = batch.filter(pc.equal(labels, lab)).column("full_name").value_counts()
        for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
            if v:
                ks.append(kind)
                keys.append(v)
                cs.append(c)
    tfn = pc.coalesce(batch.column("type_full_name"), pa.scalar(""))
    nonempty = batch.filter(pc.not_equal(tfn, ""))
    td_mask = pc.equal(nonempty.column("label"), "TYPE_DECL")
    tvals: set = set(
        pc.unique(nonempty.filter(pc.invert(td_mask)).column("type_full_name")).to_pylist()
    )
    for v in pc.unique(nonempty.filter(td_mask).column("type_full_name")).to_pylist():
        tvals.update(p for p in v.split(";") if p)
    # typedef alias targets (signature "alias:T" on TYPE_DECL) belong in
    # the TYPE dimension too
    sig = pc.coalesce(batch.column("signature"), pa.scalar(""))
    alias_sigs = batch.filter(
        pc.and_(pc.equal(labels, "TYPE_DECL"), pc.starts_with(sig, "alias:"))
    ).column("signature")
    for v in pc.unique(alias_sigs).to_pylist():
        if v and len(v) > 6:
            tvals.add(v[6:])
    for v in tvals:
        if v:
            ks.append("ty")
            keys.append(v)
            cs.append(1)
    for v in pc.unique(
        batch.filter(pc.equal(labels, "NAMESPACE_BLOCK")).column("name")
    ).to_pylist():
        if v:
            ks.append("ns")
            keys.append(v)
            cs.append(1)
    calls = batch.filter(
        pc.is_in(labels, value_set=pa.array(["CALL", "METHOD_REF"]))
    ).column("method_full_name")
    cvc = calls.value_counts()
    for v, c in zip(cvc.field("values").to_pylist(), cvc.field("counts").to_pylist()):
        if v:
            ks.append("ca")
            keys.append(v)
            cs.append(c)
    # distinct return types off METHOD signatures ("ret(args)" convention)
    msig = batch.filter(pc.equal(labels, "METHOD")).column("signature")
    rts: set[str] = set()
    for s in pc.unique(msig).to_pylist():
        if s and "(" in s:
            r = s.split("(")[0]
            if r and r != "ANY":
                rts.add(r)
    for v in sorted(rts):
        ks.append("rt")
        keys.append(v)
        cs.append(1)
    return pa.table(
        {
            "kind": pa.array(ks, pa.string()),
            "key": pa.array(keys, pa.string()),
            "c": pa.array(cs, pa.int64()),
        }
    )
