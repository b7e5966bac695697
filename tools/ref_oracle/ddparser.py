class DDParser:
    def __init__(self, **kw):
        pass
    def parse(self, sents):
        raise NotImplementedError("fixture parses only")
