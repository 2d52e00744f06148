def test_doctests():
    import pygraphblas_tpu

    failures = pygraphblas_tpu.run_doctests()
    assert failures == 0
