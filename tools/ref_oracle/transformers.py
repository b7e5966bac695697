class BertTokenizer:
    @staticmethod
    def from_pretrained(name):
        raise NotImplementedError("stub")
