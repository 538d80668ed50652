// Native Cairo0 virtual machine (C++ equivalent of the Rust `cairo-vm`
// crate used by the reference, src/cairo/runner/run.rs:64-240).
//
// Executes a program (felt words + main pc + builtin list) from the `main`
// entrypoint in non-proof mode and emits cairo-vm-compatible relocated
// binary trace (ap,fp,pc u64 LE rows) and memory (addr u64 LE + value 32B LE
// rows).  Semantics mirror lambdaworks_cairo_prover_tpu/cairo/vm.py, which
// is itself validated against the binary fixtures in the reference repo.
//
// Build: g++ -O2 -shared -fPIC -o libcairo_vm.so cairo_vm.cpp

#include <array>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <functional>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = __uint128_t;

// ---------------------------------------------------------------- felt252
struct Felt {
    u64 l[4];  // little-endian 64-bit limbs

    bool operator==(const Felt& o) const {
        return l[0] == o.l[0] && l[1] == o.l[1] && l[2] == o.l[2] && l[3] == o.l[3];
    }
    bool is_zero() const { return !(l[0] | l[1] | l[2] | l[3]); }
};

static const Felt P = {{1ull, 0ull, 0ull, 0x0800000000000011ull}};
// p = 2^251 + 17*2^192 + 1 -> limbs (64-bit): [1, 0, 0, 2^59 + 17]

static Felt felt_from_u64(u64 v) { return Felt{{v, 0, 0, 0}}; }

static int felt_cmp(const Felt& a, const Felt& b) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] < b.l[i]) return -1;
        if (a.l[i] > b.l[i]) return 1;
    }
    return 0;
}

static Felt felt_add(const Felt& a, const Felt& b) {
    Felt r;
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + c;
        r.l[i] = (u64)s;
        c = s >> 64;
    }
    if (c || felt_cmp(r, P) >= 0) {
        u128 borrow = 0;
        for (int i = 0; i < 4; ++i) {
            u128 d = (u128)r.l[i] - P.l[i] - borrow;
            r.l[i] = (u64)d;
            borrow = (d >> 64) ? 1 : 0;
        }
    }
    return r;
}

static Felt felt_sub(const Felt& a, const Felt& b) {
    Felt r;
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        r.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 c = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.l[i] + P.l[i] + c;
            r.l[i] = (u64)s;
            c = s >> 64;
        }
    }
    return r;
}

// full 512-bit product then Montgomery-free reduction by repeated folding:
// simple and adequate for the VM's rare multiplications.
static Felt felt_mul(const Felt& a, const Felt& b) {
    u64 prod[8] = {0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)a.l[i] * b.l[j] + prod[i + j] + carry;
            prod[i + j] = (u64)cur;
            carry = cur >> 64;
        }
        prod[i + 4] += (u64)carry;
    }
    // binary reduction: interpret as big int, reduce mod p via shift-subtract
    // on 512 bits.  Cost ~256 iterations; fine for VM frequency.
    // Convert to simple bitwise long division.
    // Collect into 64 bytes little-endian, then do modular reduction using
    // doubling accumulation: value = sum prod[i] * 2^(64 i) mod p.
    Felt acc = {{0, 0, 0, 0}};
    Felt base = {{1, 0, 0, 0}};  // 2^(64*i) mod p, updated per limb
    for (int i = 0; i < 8; ++i) {
        // acc += prod[i] * base  (binary expansion of prod[i])
        Felt term = base;
        u64 w = prod[i];
        for (int bit = 0; bit < 64; ++bit) {
            if (w & 1ull) acc = felt_add(acc, term);
            w >>= 1;
            if (w == 0 && bit < 63) break;
            term = felt_add(term, term);
        }
        // base *= 2^64
        for (int bit = 0; bit < 64; ++bit) base = felt_add(base, base);
    }
    return acc;
}

static Felt felt_pow(Felt b, const Felt& e) {
    Felt result = felt_from_u64(1);
    for (int limb = 0; limb < 4; ++limb) {
        u64 w = e.l[limb];
        Felt base = b;
        // need base = b^(2^(64*limb)); recompute progressively
        (void)base;
    }
    // simple square-and-multiply over all 256 bits (MSB order not needed)
    Felt base = b;
    for (int limb = 0; limb < 4; ++limb) {
        u64 w = e.l[limb];
        for (int bit = 0; bit < 64; ++bit) {
            if (w & 1ull) result = felt_mul(result, base);
            w >>= 1;
            base = felt_mul(base, base);
        }
    }
    return result;
}

static Felt felt_inv(const Felt& a) {
    // a^(p-2)
    Felt e = P;
    // e = p - 2
    Felt two = felt_from_u64(2);
    u128 borrow = 0;
    Felt r;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)e.l[i] - two.l[i] - borrow;
        r.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    return felt_pow(a, r);
}

// ---------------------------------------------------------------- values
struct Value {
    enum Kind : uint8_t { NONE = 0, FELT = 1, RELOC = 2 } kind = NONE;
    Felt f{};       // FELT payload
    int32_t seg = 0;  // RELOC payload
    u64 off = 0;

    static Value felt(const Felt& x) { Value v; v.kind = FELT; v.f = x; return v; }
    static Value reloc(int32_t s, u64 o) { Value v; v.kind = RELOC; v.seg = s; v.off = o; return v; }
    bool defined() const { return kind != NONE; }
    bool eq(const Value& o) const {
        if (kind != o.kind) return false;
        if (kind == FELT) return f == o.f;
        if (kind == RELOC) return seg == o.seg && off == o.off;
        return true;
    }
};

struct VMError : std::runtime_error {
    explicit VMError(const std::string& m) : std::runtime_error(m) {}
};

// ---------------------------------------------------------------- decoding
struct Flags {
    int dst_reg, op0_reg, op1_src, res_logic, pc_update, ap_update, opcode;
};

static Flags decode_flags(u64 word) {
    u64 flags = word >> 48;
    if (flags >> 15) throw VMError("flags exceed 15 bits");
    Flags f;
    f.dst_reg = (flags >> 0) & 1;
    f.op0_reg = (flags >> 1) & 1;
    f.op1_src = (flags >> 2) & 7;
    f.res_logic = (flags >> 5) & 3;
    f.pc_update = (flags >> 7) & 7;
    f.ap_update = (flags >> 10) & 3;
    f.opcode = (flags >> 12) & 7;
    auto ok = [](int v, std::initializer_list<int> allowed) {
        for (int a : allowed) if (v == a) return true;
        return false;
    };
    if (!ok(f.op1_src, {0, 1, 2, 4}) || !ok(f.res_logic, {0, 1, 2}) ||
        !ok(f.pc_update, {0, 1, 2, 4}) || !ok(f.ap_update, {0, 1, 2}) ||
        !ok(f.opcode, {0, 1, 2, 4}))
        throw VMError("invalid instruction flags");
    return f;
}

static int64_t decode_off(u64 word, int shift) {
    return (int64_t)((word >> shift) & 0xFFFF) - (1 << 15);
}

// ---------------------------------------------------------------- the VM
struct CairoVM {
    std::vector<std::unordered_map<u64, Value>> segments;
    std::vector<std::array<std::pair<int32_t, u64>, 3>> trace;  // ap, fp, pc
    std::vector<Felt> program;
    u64 main_pc = 0;
    std::vector<std::string> builtins;
    std::unordered_map<std::string, int32_t> builtin_segments;

    int32_t add_segment() {
        segments.emplace_back();
        return (int32_t)segments.size() - 1;
    }

    Value mem_get(int32_t seg, u64 off) {
        auto& m = segments[seg];
        auto it = m.find(off);
        return it == m.end() ? Value{} : it->second;
    }

    void mem_set(int32_t seg, u64 off, const Value& v) {
        auto& m = segments[seg];
        auto it = m.find(off);
        if (it != m.end() && !it->second.eq(v)) throw VMError("memory conflict");
        m[off] = v;
    }

    static u64 off_add(u64 base, int64_t off) { return (u64)((int64_t)base + off); }

    u64 run(u64 max_steps) {
        int32_t prog_seg = add_segment();
        int32_t exec_seg = add_segment();
        for (size_t i = 0; i < program.size(); ++i)
            mem_set(prog_seg, i, Value::felt(program[i]));

        std::vector<Value> stack;
        for (auto& name : builtins) {
            int32_t s = add_segment();
            builtin_segments[name] = s;
            stack.push_back(Value::reloc(s, 0));
        }
        int32_t ret_fp_seg = add_segment();
        int32_t end_seg = add_segment();
        stack.push_back(Value::reloc(ret_fp_seg, 0));
        stack.push_back(Value::reloc(end_seg, 0));
        for (size_t i = 0; i < stack.size(); ++i) mem_set(exec_seg, i, stack[i]);

        u64 ap = stack.size(), fp = ap;
        int32_t pc_seg = prog_seg;
        u64 pc = main_pc;

        u64 steps = 0;
        while (!(pc_seg == end_seg && pc == 0)) {
            if (steps++ >= max_steps) throw VMError("max steps exceeded");
            step(pc_seg, pc, ap, fp, exec_seg, end_seg);
        }
        return steps;
    }

    void step(int32_t& pc_seg, u64& pc, u64& ap, u64& fp, int32_t exec_seg,
              int32_t end_seg) {
        std::array<std::pair<int32_t, u64>, 3> row = {
            std::make_pair(exec_seg, ap), std::make_pair(exec_seg, fp),
            std::make_pair(pc_seg, pc)};
        trace.push_back(row);
        Value inst_v = mem_get(pc_seg, pc);
        if (inst_v.kind != Value::FELT) throw VMError("no instruction at pc");
        if (inst_v.f.l[1] || inst_v.f.l[2] || inst_v.f.l[3])
            throw VMError("instruction exceeds 64 bits");
        u64 word = inst_v.f.l[0];
        Flags fl = decode_flags(word);
        int64_t off_dst = decode_off(word, 0);
        int64_t off_op0 = decode_off(word, 16);
        int64_t off_op1 = decode_off(word, 32);

        u64 dst_off = off_add(fl.dst_reg ? fp : ap, off_dst);
        u64 op0_off = off_add(fl.op0_reg ? fp : ap, off_op0);
        Value op0 = mem_get(exec_seg, op0_off);

        int32_t op1_seg;
        u64 op1_off;
        u64 inst_size = 1;
        switch (fl.op1_src) {
            case 1:  // imm
                op1_seg = pc_seg;
                op1_off = off_add(pc, off_op1);
                inst_size = 2;
                break;
            case 2:  // fp
                op1_seg = exec_seg;
                op1_off = off_add(fp, off_op1);
                break;
            case 4:  // ap
                op1_seg = exec_seg;
                op1_off = off_add(ap, off_op1);
                break;
            case 0:  // [op0]
                if (op0.kind != Value::RELOC)
                    throw VMError("op1_src=op0 requires address");
                op1_seg = op0.seg;
                op1_off = off_add(op0.off, off_op1);
                break;
            default:
                throw VMError("bad op1_src");
        }
        Value op1 = mem_get(op1_seg, op1_off);
        Value dst = mem_get(exec_seg, dst_off);

        if (fl.opcode == 1) {  // call
            mem_set(exec_seg, op0_off, Value::reloc(pc_seg, pc + inst_size));
            mem_set(exec_seg, dst_off, Value::reloc(exec_seg, fp));
            op0 = mem_get(exec_seg, op0_off);
            dst = mem_get(exec_seg, dst_off);
        }

        std::function<Value(const Value&, const Value&)> val_add =
            [&val_add](const Value& a, const Value& b) -> Value {
            if (a.kind == Value::RELOC && b.kind == Value::FELT) {
                if (b.f.l[1] || b.f.l[2] || b.f.l[3]) {
                    // negative offsets are encoded as p - k
                    Felt neg = felt_sub(Felt{{0, 0, 0, 0}}, b.f);
                    if (neg.l[1] || neg.l[2] || neg.l[3])
                        throw VMError(
                            "reloc offset overflow lo=" + std::to_string(b.f.l[0]) +
                            " l1=" + std::to_string(b.f.l[1]) +
                            " l2=" + std::to_string(b.f.l[2]) +
                            " l3=" + std::to_string(b.f.l[3]));
                    return Value::reloc(a.seg, a.off - neg.l[0]);
                }
                return Value::reloc(a.seg, a.off + b.f.l[0]);
            }
            if (b.kind == Value::RELOC && a.kind == Value::FELT)
                return val_add(b, a);
            if (a.kind == Value::RELOC || b.kind == Value::RELOC)
                throw VMError("cannot add relocatables");
            return Value::felt(felt_add(a.f, b.f));
        };

        Value res{};
        bool res_set = false;
        if (fl.pc_update != 4) {
            switch (fl.res_logic) {
                case 0:
                    if (op1.defined()) { res = op1; res_set = true; }
                    break;
                case 1:
                    if (!op0.defined() || !op1.defined()) {
                        if (fl.opcode == 4 && dst.defined()) {
                            if (!op0.defined() && op1.defined()) {
                                Value ded = sub_vals(dst, op1);
                                mem_set(exec_seg, op0_off, ded);
                                op0 = ded;
                            } else if (!op1.defined() && op0.defined()) {
                                Value ded = sub_vals(dst, op0);
                                mem_set(op1_seg, op1_off, ded);
                                op1 = ded;
                            }
                        }
                    }
                    if (!op0.defined() || !op1.defined())
                        throw VMError("cannot compute res");
                    res = val_add(op0, op1);
                    res_set = true;
                    break;
                case 2:
                    if ((!op0.defined() || !op1.defined()) && fl.opcode == 4 &&
                        dst.defined() && dst.kind == Value::FELT) {
                        if (!op1.defined() && op0.kind == Value::FELT &&
                            !op0.f.is_zero()) {
                            Value ded = Value::felt(
                                felt_mul(dst.f, felt_inv(op0.f)));
                            mem_set(op1_seg, op1_off, ded);
                            op1 = ded;
                        } else if (!op0.defined() && op1.kind == Value::FELT &&
                                   !op1.f.is_zero()) {
                            Value ded = Value::felt(
                                felt_mul(dst.f, felt_inv(op1.f)));
                            mem_set(exec_seg, op0_off, ded);
                            op0 = ded;
                        }
                    }
                    if (op0.kind != Value::FELT || op1.kind != Value::FELT)
                        throw VMError("mul needs felts");
                    res = Value::felt(felt_mul(op0.f, op1.f));
                    res_set = true;
                    break;
                default:
                    throw VMError("bad res_logic");
            }
            if (!res_set && fl.opcode == 4 && dst.defined()) {
                res = dst;
                res_set = true;
                mem_set(op1_seg, op1_off, dst);
                op1 = dst;
            }
        }

        if (fl.opcode == 4) {  // assert_eq
            if (!res_set) throw VMError("assert_eq unknown res");
            if (!dst.defined()) {
                mem_set(exec_seg, dst_off, res);
                dst = res;
            } else if (!dst.eq(res)) {
                throw VMError("assert_eq failed");
            }
        }

        // pc update
        int32_t npc_seg = pc_seg;
        u64 npc;
        switch (fl.pc_update) {
            case 0:
                npc = pc + inst_size;
                break;
            case 1:
                if (res.kind != Value::RELOC) throw VMError("jump abs needs address");
                npc_seg = res.seg;
                npc = res.off;
                break;
            case 2: {
                if (res.kind != Value::FELT) throw VMError("jump rel needs felt");
                Value moved = val_add(Value::reloc(pc_seg, pc), res);
                npc_seg = moved.seg;
                npc = moved.off;
                break;
            }
            case 4: {
                if (!dst.defined()) throw VMError("jnz unknown dst");
                bool nz = !(dst.kind == Value::FELT && dst.f.is_zero());
                if (!nz) {
                    npc = pc + inst_size;
                } else {
                    if (op1.kind != Value::FELT) throw VMError("jnz bad op1");
                    Value moved = val_add(Value::reloc(pc_seg, pc), op1);
                    npc_seg = moved.seg;
                    npc = moved.off;
                }
                break;
            }
            default:
                throw VMError("bad pc_update");
        }

        // ap update
        u64 nap;
        switch (fl.ap_update) {
            case 0:
                nap = ap + (fl.opcode == 1 ? 2 : 0);
                break;
            case 1: {
                if (res.kind != Value::FELT) throw VMError("ap+=res bad res");
                if (res.f.l[1] || res.f.l[2] || res.f.l[3])
                    throw VMError("ap+=res overflow");
                nap = ap + res.f.l[0];
                break;
            }
            case 2:
                nap = ap + 1;
                break;
            default:
                throw VMError("bad ap_update");
        }

        // fp update
        u64 nfp = fp;
        if (fl.opcode == 1) {
            nfp = ap + 2;
        } else if (fl.opcode == 2) {
            if (dst.kind != Value::RELOC) throw VMError("ret bad dst");
            // dst.seg != exec_seg only on the final ret from main (restores
            // the return_fp sentinel); the value is dead because pc == end.
            nfp = dst.off;
        }

        pc_seg = npc_seg;
        pc = npc;
        ap = nap;
        fp = nfp;
    }

    static Value sub_vals(const Value& a, const Value& b) {
        if (a.kind == Value::FELT && b.kind == Value::FELT)
            return Value::felt(felt_sub(a.f, b.f));
        if (a.kind == Value::RELOC && b.kind == Value::FELT)
            return Value::reloc(a.seg, a.off - b.f.l[0]);
        if (a.kind == Value::RELOC && b.kind == Value::RELOC &&
            a.seg == b.seg)
            return Value::felt(felt_from_u64(a.off - b.off));
        throw VMError("bad subtraction");
    }
};

// ---------------------------------------------------------------- output
struct RunResult {
    std::vector<uint8_t> trace_bytes;   // 24B rows: ap, fp, pc (u64 LE)
    std::vector<uint8_t> memory_bytes;  // 40B rows: addr u64 LE + 32B value LE
    u64 rc_start = 0, rc_end = 0;       // range_check relocated range (0,0 = none)
    u64 out_start = 0, out_end = 0;     // output relocated range (0,0 = none)
    std::string error;
};

}  // namespace

extern "C" {

// program_felts: n*32 bytes little-endian; builtins_mask bit0 = output,
// bit1 = range_check (order: output first, then range_check).
RunResult* cairo_vm_run(const uint8_t* program_felts, u64 n_felts, u64 main_pc,
                        u64 builtins_mask, u64 max_steps) {
    auto* out = new RunResult();
    try {
        CairoVM vm;
        vm.main_pc = main_pc;
        for (u64 i = 0; i < n_felts; ++i) {
            Felt f;
            std::memcpy(f.l, program_felts + i * 32, 32);
            vm.program.push_back(f);
        }
        if (builtins_mask & 1) vm.builtins.push_back("output");
        if (builtins_mask & 2) vm.builtins.push_back("range_check");
        vm.run(max_steps);

        // relocation: segments contiguous from address 1, sized by used cells
        std::vector<u64> sizes, bases;
        u64 acc = 1;
        for (auto& seg : vm.segments) {
            u64 sz = 0;
            for (auto& kv : seg) sz = std::max(sz, kv.first + 1);
            sizes.push_back(sz);
            bases.push_back(acc);
            acc += sz;
        }
        auto reloc_val = [&](const Value& v) -> Felt {
            if (v.kind == Value::RELOC)
                return felt_from_u64(bases[v.seg] + v.off);
            return v.f;
        };

        for (auto& row : vm.trace) {
            u64 vals[3];
            for (int i = 0; i < 3; ++i)
                vals[i] = bases[row[i].first] + row[i].second;
            uint8_t buf[24];
            std::memcpy(buf, &vals[0], 8);      // ap
            std::memcpy(buf + 8, &vals[1], 8);  // fp
            std::memcpy(buf + 16, &vals[2], 8); // pc
            out->trace_bytes.insert(out->trace_bytes.end(), buf, buf + 24);
        }

        std::vector<std::pair<u64, Felt>> mem;
        for (size_t s = 0; s < vm.segments.size(); ++s)
            for (auto& kv : vm.segments[s])
                mem.push_back({bases[s] + kv.first, reloc_val(kv.second)});
        for (auto& [addr, val] : mem) {
            uint8_t buf[40];
            std::memcpy(buf, &addr, 8);
            std::memcpy(buf + 8, val.l, 32);
            out->memory_bytes.insert(out->memory_bytes.end(), buf, buf + 40);
        }

        auto it = vm.builtin_segments.find("range_check");
        if (it != vm.builtin_segments.end()) {
            out->rc_start = bases[it->second];
            out->rc_end = bases[it->second] + sizes[it->second];
        }
        auto ot = vm.builtin_segments.find("output");
        if (ot != vm.builtin_segments.end()) {
            out->out_start = bases[ot->second];
            out->out_end = bases[ot->second] + sizes[ot->second];
        }
    } catch (const std::exception& e) {
        out->error = e.what();
    }
    return out;
}

const uint8_t* cairo_vm_trace_ptr(RunResult* r) { return r->trace_bytes.data(); }
u64 cairo_vm_trace_len(RunResult* r) { return r->trace_bytes.size(); }
const uint8_t* cairo_vm_memory_ptr(RunResult* r) { return r->memory_bytes.data(); }
u64 cairo_vm_memory_len(RunResult* r) { return r->memory_bytes.size(); }
u64 cairo_vm_rc_start(RunResult* r) { return r->rc_start; }
u64 cairo_vm_rc_end(RunResult* r) { return r->rc_end; }
u64 cairo_vm_out_start(RunResult* r) { return r->out_start; }
u64 cairo_vm_out_end(RunResult* r) { return r->out_end; }
const char* cairo_vm_error(RunResult* r) {
    return r->error.empty() ? nullptr : r->error.c_str();
}
void cairo_vm_free(RunResult* r) { delete r; }

}  // extern "C"
