def detect(text):
    raise NotImplementedError("stub")
