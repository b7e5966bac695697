class CoreNLPClient:
    def __init__(self, *a, **kw):
        raise NotImplementedError("stub")
