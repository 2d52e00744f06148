from pygraphblas_tpu import descriptor


def test_merge_equivalence():
    assert (descriptor.T0 & descriptor.C) == descriptor.CT0
    assert (descriptor.C & descriptor.T0) == descriptor.CT0
    assert (descriptor.R & descriptor.S & descriptor.C) == descriptor.RSC
    assert (descriptor.T0 & descriptor.T1) == descriptor.T0T1
    assert (descriptor.R & descriptor.C & descriptor.T0 & descriptor.T1) \
        == descriptor.RCT0T1


def test_flags():
    assert descriptor.T0.inp0 and not descriptor.T0.inp1
    assert descriptor.T1.inp1 and not descriptor.T1.inp0
    assert descriptor.C.complement
    assert descriptor.S.structural
    assert descriptor.R.replace
    d = descriptor.RSCT0T1
    assert d.inp0 and d.inp1 and d.complement and d.structural and d.replace


def test_contains():
    assert descriptor.T0 in descriptor.T0T1
    assert descriptor.T0 in descriptor.RCT0
    assert not (descriptor.T0 in descriptor.T1)
    assert descriptor.C in descriptor.RC
    assert not (descriptor.R in descriptor.C)


def test_context_manager():
    from pygraphblas_tpu.descriptor import current_desc

    with descriptor.T0:
        assert current_desc.get(None) is descriptor.T0
    assert current_desc.get(None) is None


def test_all_27_exist():
    names = [r + s + c + t
             for r in ("", "R") for s in ("", "S") for c in ("", "C")
             for t in ("", "T0", "T1", "T0T1")]
    names.remove("")
    for nm in names:
        assert hasattr(descriptor, nm), nm
