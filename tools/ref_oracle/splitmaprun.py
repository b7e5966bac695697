# Oracle for the mapping-threaded splitter (newsspike re-split path):
# replay multi-chunk batteries with custom initial mappings through the
# reference split_str(splitted, split_mapping).
import sys, json, io
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
real_stdout = sys.stdout
sys.stdout = io.StringIO()
import preprocess_corpus as pc
sys.stdout = real_stdout

batteries = json.load(open(sys.argv[1], encoding='utf8'))
results = []
sys.stdout = io.StringIO()
for b in batteries:
    splitted, idxs = pc.split_str(b['chunks'], b['mapping'])
    results.append({'sentences': splitted, 'idxs': idxs})
sys.stdout = real_stdout
json.dump(results, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False)
print(f"wrote {len(results)}")
