// RV64IM interpreter with timestamped-memory event recording.
//
// The native executor for the TPU proving framework: executes a guest
// program and streams per-cycle event records that Python tracegen turns
// into AIR trace matrices. Mirrors the role of the reference's executor
// family (reference: crates/core/executor/src/vm.rs CoreVM +
// crates/core/jit — we use a portable C++ interpreter instead of an
// x86-64 JIT for the first revision; the event schema is our own).
//
// Memory model: 8-byte words, timestamped. Every register/memory access
// records the previous timestamp (and previous value for writes), which
// is exactly what the memory LogUp argument needs. Registers live at
// "addresses" 0..31 in a separate register file; RAM is sparse.
//
// Timestamps: ts = clk*8 + slot (slot 1: rs1 read, 2: rs2 read,
// 3: memory access, 4: rd write).
//
// Build: g++ -O2 -shared -fPIC -o libsp1executor.so executor.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Event {
    uint64_t clk;        // cycle count (1-based)
    uint64_t pc;
    uint64_t instr;      // raw 32-bit instruction word
    uint64_t next_pc;
    uint64_t a;          // rd result value (after execute)
    uint64_t b;          // rs1 value
    uint64_t c;          // rs2 value or immediate
    uint64_t rs1_prev_ts;
    uint64_t rs2_prev_ts;
    uint64_t rd_prev_ts;
    uint64_t rd_prev_val;
    uint64_t mem_addr;     // 0 if no memory access
    uint64_t mem_prev_ts;
    uint64_t mem_prev_val;
    uint64_t mem_val;      // value after access (== prev for loads)
    uint64_t flags;        // bit0: is_mem_op, bit1: is_store, bit2: halted
};

struct MemCell {
    uint64_t value = 0;
    uint64_t ts = 0;
};

// One precompile round's worth of memory traffic (reference role: the
// deferred precompile event records of
// crates/core/executor/src/events/precompiles/ — ours is a fixed-shape
// record so Python can consume it as one structured numpy array).
// Up to 4 reads + 1 read-modify-write per round.
struct PxEvent {
    uint64_t clk;           // per-round clk (parent ecall clk + 1 + step)
    uint64_t kind;          // syscall id
    uint64_t step;          // round index within the call
    uint64_t ptr;           // base byte pointer (a0 at the ecall)
    uint64_t r_addr[4];     // cell-aligned byte addrs of reads (unused = 0)
    uint64_t r_prev_ts[4];
    uint64_t r_val[4];
    uint64_t w_addr;        // cell-aligned byte addr of the write (0 = none)
    uint64_t w_prev_ts;
    uint64_t w_prev_val;
    uint64_t w_val;
};

// Opcode classes for the execution report (reference role:
// crates/core/executor/src/report.rs ExecutionReport opcode counts).
enum OpClass : uint32_t {
    OP_ALU = 0, OP_ALU_IMM, OP_ALU_W, OP_ALU_IMM_W, OP_MUL, OP_DIV,
    OP_LOAD, OP_STORE, OP_BRANCH, OP_JAL, OP_JALR, OP_LUI, OP_AUIPC,
    OP_ECALL, OP_CLASS_COUNT
};

struct VM {
    std::vector<uint32_t> program;
    uint64_t pc_base = 0;
    uint64_t pc = 0;
    uint64_t clk = 0;
    uint64_t regs[32] = {0};
    uint64_t reg_ts[32] = {0};
    std::unordered_map<uint64_t, MemCell> memory;
    std::vector<Event> events;
    std::vector<PxEvent> px_events;
    bool halted = false;
    bool record = true;   // false: pure-execution mode (no event stream) —
                          // the analog of the reference's minimal executor
                          // (crates/core/jit MinimalTrace without tracing)
    uint64_t exit_code = 0;
    std::vector<uint8_t> output;       // bytes written via write syscall
    std::vector<uint64_t> input_queue; // words read via read syscall
    size_t input_pos = 0;
    uint64_t op_counts[OP_CLASS_COUNT] = {0};
    uint64_t syscall_counts[64] = {0};  // by syscall id (small ABI space)
    // Untrusted (user) execution mode: per-page protection checks on
    // every fetch/load/store and precompile buffer access (reference
    // role: crates/core/executor/src/mode.rs UserMode +
    // minimal/precompiles/mprotect.rs). Pages are 4 KiB over the 32-bit
    // guest address space -> 2^20 prot bytes, lazily allocated.
    bool user_mode = false;
    std::vector<uint8_t> page_prot;
    uint64_t trap_code = 0;  // 0 = none; see TRAP_* below
    uint64_t trap_addr = 0;
};

// Page-protection constants (ELF PF_* bit encoding, matching the
// reference's consts.rs: PROT_EXEC=1, PROT_WRITE=2, PROT_READ=4).
enum : uint8_t {
    PROT_NONE = 0, PROT_EXEC = 1, PROT_WRITE = 2, PROT_READ = 4,
    DEFAULT_PAGE_PROT = PROT_READ | PROT_WRITE,
};
enum : uint64_t {
    TRAP_READ_VIOLATION = 1, TRAP_WRITE_VIOLATION = 2,
    TRAP_EXEC_VIOLATION = 3, TRAP_BAD_MPROTECT = 4,
};
constexpr int LOG_PAGE_SIZE = 12;
constexpr size_t NUM_PAGES = 1ULL << (32 - LOG_PAGE_SIZE);

inline std::vector<uint8_t>& page_table(VM& vm) {
    if (vm.page_prot.empty())
        vm.page_prot.assign(NUM_PAGES, DEFAULT_PAGE_PROT);
    return vm.page_prot;
}

// Check one access; only ever called in user mode. Sets the trap state
// and returns false on a violation (the step loop then stops, and
// ex_run reports -2 so the host can distinguish a protection fault
// from an illegal instruction).
inline bool prot_ok(VM& vm, uint64_t addr, uint8_t need, uint64_t trap) {
    uint8_t p = page_table(vm)[(addr >> LOG_PAGE_SIZE) & (NUM_PAGES - 1)];
    if ((p & need) == need) return true;
    vm.trap_code = trap;
    vm.trap_addr = addr;
    return false;
}

// Precompile buffers must be readable AND writable (the reference
// checks each page touched by a syscall's memory traffic).
inline bool px_prot_ok(VM& vm, uint64_t ptr, uint64_t nbytes) {
    if (!vm.user_mode) return true;
    for (uint64_t a = ptr & ~((1ULL << LOG_PAGE_SIZE) - 1); a < ptr + nbytes;
         a += 1ULL << LOG_PAGE_SIZE) {
        if (!prot_ok(vm, a, PROT_READ, TRAP_READ_VIOLATION)) return false;
        if (!prot_ok(vm, a, PROT_WRITE, TRAP_WRITE_VIOLATION)) return false;
    }
    return true;
}

// ---------------------------------------------------------------------------
// 256-bit modular arithmetic for the curve / uint256 precompiles
// (reference role: crates/curves/ bigint ops used by the executor's
// syscall handlers, crates/core/executor/src/syscalls/precompiles/).
// Little-endian uint64 limbs; generic shift-subtract reduction so any
// modulus works (incl. the uint256 syscall's arbitrary m).
// ---------------------------------------------------------------------------

struct U256 { uint64_t w[4] = {0, 0, 0, 0}; };

inline bool u256_is_zero(const U256& a) {
    return !(a.w[0] | a.w[1] | a.w[2] | a.w[3]);
}

inline int u256_cmp(const U256& a, const U256& b) {
    for (int i = 3; i >= 0; i--) {
        if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
    }
    return 0;
}

inline U256 u256_sub(const U256& a, const U256& b) {  // assumes a >= b
    U256 r; unsigned __int128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        unsigned __int128 d = (unsigned __int128)a.w[i] - b.w[i] - (uint64_t)borrow;
        r.w[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    return r;
}

inline void u256_mul(const U256& a, const U256& b, uint64_t out[8]) {
    for (int i = 0; i < 8; i++) out[i] = 0;
    for (int i = 0; i < 4; i++) {
        unsigned __int128 carry = 0;
        for (int j = 0; j < 4; j++) {
            unsigned __int128 cur = (unsigned __int128)a.w[i] * b.w[j] +
                                    out[i + j] + (uint64_t)carry;
            out[i + j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        out[i + 4] += (uint64_t)carry;
    }
}

// 512-bit value mod 256-bit m via bitwise shift-subtract (m != 0).
inline U256 u512_mod(const uint64_t v[8], const U256& m) {
    U256 r;
    for (int bit = 511; bit >= 0; bit--) {
        // r = (r << 1) | v_bit; r < 2m always, so one conditional subtract
        uint64_t top = r.w[3] >> 63;
        for (int i = 3; i > 0; i--) r.w[i] = (r.w[i] << 1) | (r.w[i - 1] >> 63);
        r.w[0] = (r.w[0] << 1) | ((v[bit / 64] >> (bit % 64)) & 1);
        if (top || u256_cmp(r, m) >= 0) r = u256_sub(r, m);
    }
    return r;
}

inline U256 u256_modmul(const U256& a, const U256& b, const U256& m) {
    uint64_t prod[8];
    u256_mul(a, b, prod);
    return u512_mod(prod, m);
}

inline U256 u256_modadd(const U256& a, const U256& b, const U256& m) {
    // (a + b) mod m for a, b < m
    U256 r; unsigned __int128 carry = 0;
    for (int i = 0; i < 4; i++) {
        unsigned __int128 s = (unsigned __int128)a.w[i] + b.w[i] + (uint64_t)carry;
        r.w[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || u256_cmp(r, m) >= 0) r = u256_sub(r, m);
    return r;
}

inline U256 u256_modsub(const U256& a, const U256& b, const U256& m) {
    if (u256_cmp(a, b) >= 0) return u256_sub(a, b);
    return u256_sub(m, u256_sub(b, a));
}

inline U256 u256_modpow(const U256& a, const U256& e, const U256& m) {
    U256 base = a, result;
    result.w[0] = 1;
    for (int bit = 0; bit < 256; bit++) {
        if ((e.w[bit / 64] >> (bit % 64)) & 1)
            result = u256_modmul(result, base, m);
        base = u256_modmul(base, base, m);
    }
    return result;
}

// a^(m-2) mod m — modular inverse for prime m (Fermat).
inline U256 u256_modinv(const U256& a, const U256& m) {
    return u256_modpow(a, u256_sub(m, U256{{2, 0, 0, 0}}), m);
}

inline U256 u256_shr(const U256& a, int k) {  // k < 64
    U256 r;
    for (int i = 0; i < 4; i++) {
        r.w[i] = a.w[i] >> k;
        if (i < 3 && k) r.w[i] |= a.w[i + 1] << (64 - k);
    }
    return r;
}

inline U256 u256_add_small(const U256& a, uint64_t v) {
    U256 r = a;
    unsigned __int128 s = (unsigned __int128)r.w[0] + v;
    r.w[0] = (uint64_t)s;
    for (int i = 1; i < 4 && (s >> 64); i++) {
        s = (unsigned __int128)r.w[i] + 1;
        r.w[i] = (uint64_t)s;
    }
    return r;
}

// ---------------------------------------------------------------------------
// Generic NW-word big integers for the 384-bit curve precompiles
// (bls12-381; reference role: crates/curves/src/weierstrass/bls12_381.rs).
// ---------------------------------------------------------------------------

template <int NW> struct UBig { uint64_t w[NW] = {0}; };

template <int NW> inline bool ub_is_zero(const UBig<NW>& a) {
    uint64_t acc = 0;
    for (int i = 0; i < NW; i++) acc |= a.w[i];
    return acc == 0;
}

template <int NW> inline int ub_cmp(const UBig<NW>& a, const UBig<NW>& b) {
    for (int i = NW - 1; i >= 0; i--)
        if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
    return 0;
}

template <int NW> inline UBig<NW> ub_sub(const UBig<NW>& a, const UBig<NW>& b) {
    UBig<NW> r; unsigned __int128 borrow = 0;
    for (int i = 0; i < NW; i++) {
        unsigned __int128 d = (unsigned __int128)a.w[i] - b.w[i] - (uint64_t)borrow;
        r.w[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    return r;
}

template <int NW>
inline void ub_mul(const UBig<NW>& a, const UBig<NW>& b, uint64_t out[2 * NW]) {
    for (int i = 0; i < 2 * NW; i++) out[i] = 0;
    for (int i = 0; i < NW; i++) {
        unsigned __int128 carry = 0;
        for (int j = 0; j < NW; j++) {
            unsigned __int128 cur = (unsigned __int128)a.w[i] * b.w[j] +
                                    out[i + j] + (uint64_t)carry;
            out[i + j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        out[i + NW] += (uint64_t)carry;
    }
}

template <int NW>
inline UBig<NW> ub_wide_mod(const uint64_t v[2 * NW], const UBig<NW>& m) {
    UBig<NW> r;
    for (int bit = 2 * NW * 64 - 1; bit >= 0; bit--) {
        uint64_t top = r.w[NW - 1] >> 63;
        for (int i = NW - 1; i > 0; i--)
            r.w[i] = (r.w[i] << 1) | (r.w[i - 1] >> 63);
        r.w[0] = (r.w[0] << 1) | ((v[bit / 64] >> (bit % 64)) & 1);
        if (top || ub_cmp(r, m) >= 0) r = ub_sub(r, m);
    }
    return r;
}

template <int NW>
inline UBig<NW> ub_modmul(const UBig<NW>& a, const UBig<NW>& b, const UBig<NW>& m) {
    uint64_t prod[2 * NW];
    ub_mul(a, b, prod);
    return ub_wide_mod<NW>(prod, m);
}

template <int NW>
inline UBig<NW> ub_modadd(const UBig<NW>& a, const UBig<NW>& b, const UBig<NW>& m) {
    UBig<NW> r; unsigned __int128 carry = 0;
    for (int i = 0; i < NW; i++) {
        unsigned __int128 sum = (unsigned __int128)a.w[i] + b.w[i] + (uint64_t)carry;
        r.w[i] = (uint64_t)sum;
        carry = sum >> 64;
    }
    if (carry || ub_cmp(r, m) >= 0) r = ub_sub(r, m);
    return r;
}

template <int NW>
inline UBig<NW> ub_modsub(const UBig<NW>& a, const UBig<NW>& b, const UBig<NW>& m) {
    if (ub_cmp(a, b) >= 0) return ub_sub(a, b);
    return ub_sub(m, ub_sub(b, a));
}

template <int NW>
inline UBig<NW> ub_modpow(const UBig<NW>& a, const UBig<NW>& e, const UBig<NW>& m) {
    UBig<NW> base = a, result;
    result.w[0] = 1;
    for (int bit = 0; bit < NW * 64; bit++) {
        if ((e.w[bit / 64] >> (bit % 64)) & 1)
            result = ub_modmul(result, base, m);
        base = ub_modmul(base, base, m);
    }
    return result;
}

template <int NW>
inline UBig<NW> ub_modinv(const UBig<NW>& a, const UBig<NW>& m) {
    UBig<NW> two; two.w[0] = 2;
    return ub_modpow(a, ub_sub(m, two), m);
}

// ---------------------------------------------------------------------------
// KoalaBear Poseidon2 width-16 for the poseidon2 precompile (reference:
// syscall/precompiles/poseidon2/; constants = ops/poseidon2.py tables).
// ---------------------------------------------------------------------------

static const uint64_t KB_P = (1ULL << 31) - (1ULL << 24) + 1;

static const uint32_t P2_EXT_RC[8][16] = {
    {0x7EE56A48, 0x11367045, 0x12E41941, 0x7EBBC12B, 0x1970B7D5, 0x662B60E8, 0x3E4990C6, 0x679F91F5, 0x350813BB, 0x00874AD4, 0x28A0081A, 0x18FA5872, 0x5F25B071, 0x5E5D5998, 0x5E6FD3E7, 0x5B2E2660},
    {0x6F1837BF, 0x3FE6182B, 0x1EDD7AC5, 0x57470D00, 0x43D486D5, 0x1982C70F, 0x0EA53AF9, 0x61D6165B, 0x51639C00, 0x2DEC352C, 0x2950E531, 0x2D2CB947, 0x08256CEF, 0x1A0109F6, 0x1F51FAF3, 0x5CEF1C62},
    {0x3D65E50E, 0x33D91626, 0x133D5A1E, 0x0FF49B0D, 0x38900CD1, 0x2C22CC3F, 0x28852BB2, 0x06C65A02, 0x7B2CF7BC, 0x68016E1A, 0x15E16BC0, 0x5248149A, 0x6DD212A0, 0x18D6830A, 0x5001BE82, 0x64DAC34E},
    {0x5902B287, 0x426583A0, 0x0C921632, 0x3FE028A5, 0x245F8E49, 0x43BB297E, 0x7873DBD9, 0x3CC987DF, 0x286BB4CE, 0x640A8DCD, 0x512A8E36, 0x03A4CF55, 0x481837A2, 0x03D6DA84, 0x73726AC7, 0x760E7FDF},
    {0x43E7DC24, 0x259A5D61, 0x27E85A3B, 0x1B9133FA, 0x343E5628, 0x485CD4C2, 0x16E269F5, 0x165B60C6, 0x25F683D9, 0x124F81F9, 0x174331F9, 0x77344DC5, 0x5A821DBA, 0x5FC4177F, 0x54153BF5, 0x5E3F1194},
    {0x3BDBF191, 0x088C84A3, 0x68256C9B, 0x3C90BBC6, 0x6846166A, 0x03F4238D, 0x463335FB, 0x5E3D3551, 0x6E59AE6F, 0x32D06CC0, 0x596293F3, 0x6C87EDB2, 0x08FC60B5, 0x34BCCA80, 0x24F007F3, 0x62731C6F},
    {0x1E1DB6C6, 0x0CA409BB, 0x585C1E78, 0x56E94EDC, 0x16D22734, 0x18E11467, 0x7B2C3730, 0x770075E4, 0x35D1B18C, 0x22BE3DB5, 0x4FB1FBB7, 0x477CB3ED, 0x7D5311C6, 0x5B62AE7D, 0x559C5FA8, 0x77F15048},
    {0x3211570B, 0x490FEF6A, 0x77EC311F, 0x2247171B, 0x4E0AC711, 0x2EDF69C9, 0x3B5A8850, 0x65809421, 0x5619B4AA, 0x362019A7, 0x6BF9D4ED, 0x5B413DFF, 0x617E181E, 0x5E7AB57B, 0x33AD7833, 0x3466C7CA},
};
static const uint32_t P2_INT_RC[20] = {0x54DFEB5D, 0x7D40AFD6, 0x722CB316, 0x106A4573, 0x45A7CCDB, 0x44061375, 0x154077A5, 0x45744FAA, 0x4EB5E5EE, 0x3794E83F, 0x47C7093C, 0x5694903C, 0x69CB6299, 0x373DF84C, 0x46A0DF58, 0x46B8758A, 0x3241EBCB, 0x0B09D233, 0x1AF42357, 0x1E66CEC2};
static const uint32_t P2_DIAG[16] = {0x7EFFFFFF, 0x00000001, 0x00000002, 0x00000004, 0x00000008, 0x00000010, 0x00000020, 0x00000040, 0x00000080, 0x00000100, 0x00000200, 0x00000400, 0x00000800, 0x00001000, 0x00002000, 0x00008000};


inline uint64_t kb_mul(uint64_t a, uint64_t b) { return a * b % KB_P; }

inline void kb_ext_layer(uint64_t s[16]) {
    uint64_t o[16];
    for (int g = 0; g < 16; g += 4) {
        uint64_t x0 = s[g], x1 = s[g+1], x2 = s[g+2], x3 = s[g+3];
        o[g]   = (2*x0 + 3*x1 + x2 + x3) % KB_P;
        o[g+1] = (x0 + 2*x1 + 3*x2 + x3) % KB_P;
        o[g+2] = (x0 + x1 + 2*x2 + 3*x3) % KB_P;
        o[g+3] = (3*x0 + x1 + x2 + 2*x3) % KB_P;
    }
    uint64_t sums[4];
    for (int l = 0; l < 4; l++)
        sums[l] = (o[l] + o[4+l] + o[8+l] + o[12+l]) % KB_P;
    for (int i = 0; i < 16; i++) s[i] = (o[i] + sums[i % 4]) % KB_P;
}

inline void kb_poseidon2(uint64_t s[16]) {
    for (int i = 0; i < 16; i++) s[i] %= KB_P;
    kb_ext_layer(s);
    for (int r = 0; r < 4; r++) {
        for (int i = 0; i < 16; i++) {
            uint64_t v = (s[i] + P2_EXT_RC[r][i]) % KB_P;
            s[i] = kb_mul(kb_mul(v, v), v);
        }
        kb_ext_layer(s);
    }
    for (int r = 0; r < 20; r++) {
        uint64_t v = (s[0] + P2_INT_RC[r]) % KB_P;
        s[0] = kb_mul(kb_mul(v, v), v);
        uint64_t total = 0;
        for (int i = 0; i < 16; i++) total = (total + s[i]) % KB_P;
        for (int i = 0; i < 16; i++)
            s[i] = (kb_mul(s[i], P2_DIAG[i]) + total) % KB_P;
    }
    for (int r = 4; r < 8; r++) {
        for (int i = 0; i < 16; i++) {
            uint64_t v = (s[i] + P2_EXT_RC[r][i]) % KB_P;
            s[i] = kb_mul(kb_mul(v, v), v);
        }
        kb_ext_layer(s);
    }
}

inline int64_t sext(uint64_t v, int bits) {
    int shift = 64 - bits;
    return ((int64_t)(v << shift)) >> shift;
}

inline uint32_t rotr32(uint32_t x, int r) { return (x >> r) | (x << (32 - r)); }

// Fetch a word-aligned 8-byte cell; addr is byte address.
MemCell& cell(VM& vm, uint64_t byte_addr) { return vm.memory[byte_addr & ~7ULL]; }

uint64_t load_sized(VM& vm, uint64_t addr, int size_log, bool sign, Event& ev) {
    MemCell& c = cell(vm, addr);
    ev.mem_addr = addr & ~7ULL;
    ev.mem_prev_ts = c.ts;
    ev.mem_prev_val = c.value;
    uint64_t word = c.value;
    c.ts = vm.clk * 8 + 3;
    ev.mem_val = c.value;
    ev.flags |= 1;
    int off = addr & 7;
    uint64_t v;
    switch (size_log) {
        case 0: v = (word >> (off * 8)) & 0xffULL; return sign ? (uint64_t)sext(v, 8) : v;
        case 1: v = (word >> (off * 8)) & 0xffffULL; return sign ? (uint64_t)sext(v, 16) : v;
        case 2: v = (word >> (off * 8)) & 0xffffffffULL; return sign ? (uint64_t)sext(v, 32) : v;
        default: return word;
    }
}

void store_sized(VM& vm, uint64_t addr, uint64_t val, int size_log, Event& ev) {
    MemCell& c = cell(vm, addr);
    ev.mem_addr = addr & ~7ULL;
    ev.mem_prev_ts = c.ts;
    ev.mem_prev_val = c.value;
    int off = addr & 7;
    uint64_t word = c.value;
    switch (size_log) {
        case 0: {
            uint64_t mask = 0xffULL << (off * 8);
            word = (word & ~mask) | ((val & 0xff) << (off * 8));
            break;
        }
        case 1: {
            uint64_t mask = 0xffffULL << (off * 8);
            word = (word & ~mask) | ((val & 0xffff) << (off * 8));
            break;
        }
        case 2: {
            uint64_t mask = 0xffffffffULL << (off * 8);
            word = (word & ~mask) | ((val & 0xffffffff) << (off * 8));
            break;
        }
        default: word = val; break;
    }
    c.value = word;
    c.ts = vm.clk * 8 + 3;
    ev.mem_val = word;
    ev.flags |= 1 | 2;
}

bool step(VM& vm) {
    uint64_t idx = (vm.pc - vm.pc_base) / 4;
    if (idx >= vm.program.size()) return false;
    if (vm.user_mode && !prot_ok(vm, vm.pc, PROT_EXEC, TRAP_EXEC_VIOLATION))
        return false;
    uint32_t instr = vm.program[idx];
    vm.clk += 1;

    Event ev{};
    ev.clk = vm.clk;
    ev.pc = vm.pc;
    ev.instr = instr;

    uint32_t opcode = instr & 0x7f;
    uint32_t rd = (instr >> 7) & 0x1f;
    uint32_t funct3 = (instr >> 12) & 0x7;
    uint32_t rs1 = (instr >> 15) & 0x1f;
    uint32_t rs2 = (instr >> 20) & 0x1f;
    uint32_t funct7 = (instr >> 25) & 0x7f;

    switch (opcode) {  // execution-report opcode histogram
        case 0x33: vm.op_counts[funct7 == 0x01 ? (funct3 < 4 ? OP_MUL : OP_DIV) : OP_ALU]++; break;
        case 0x3b: vm.op_counts[funct7 == 0x01 ? (funct3 == 0 ? OP_MUL : OP_DIV) : OP_ALU_W]++; break;
        case 0x13: vm.op_counts[OP_ALU_IMM]++; break;
        case 0x1b: vm.op_counts[OP_ALU_IMM_W]++; break;
        case 0x03: vm.op_counts[OP_LOAD]++; break;
        case 0x23: vm.op_counts[OP_STORE]++; break;
        case 0x63: vm.op_counts[OP_BRANCH]++; break;
        case 0x6f: vm.op_counts[OP_JAL]++; break;
        case 0x67: vm.op_counts[OP_JALR]++; break;
        case 0x37: vm.op_counts[OP_LUI]++; break;
        case 0x17: vm.op_counts[OP_AUIPC]++; break;
        case 0x73: vm.op_counts[OP_ECALL]++; break;
        default: break;
    }

    // Read operands with timestamp bookkeeping.
    auto read_reg = [&](uint32_t r, int slot) -> uint64_t {
        uint64_t prev = vm.reg_ts[r];
        vm.reg_ts[r] = vm.clk * 8 + slot;
        return vm.regs[r];
    };

    uint64_t b = 0, c = 0, a = 0;
    uint64_t next_pc = vm.pc + 4;
    bool wr = false;

    int64_t imm_i = sext(instr >> 20, 12);
    int64_t imm_s = sext(((instr >> 25) << 5) | ((instr >> 7) & 0x1f), 12);
    int64_t imm_b = sext((((instr >> 31) & 1) << 12) | (((instr >> 7) & 1) << 11) |
                             (((instr >> 25) & 0x3f) << 5) | (((instr >> 8) & 0xf) << 1),
                         13);
    int64_t imm_u = (int64_t)(int32_t)(instr & 0xfffff000u);
    int64_t imm_j = sext((((instr >> 31) & 1) << 20) | (((instr >> 12) & 0xff) << 12) |
                             (((instr >> 20) & 1) << 11) | (((instr >> 21) & 0x3ff) << 1),
                         21);

    switch (opcode) {
        case 0x33: {  // R-type ALU
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            ev.rs2_prev_ts = vm.reg_ts[rs2]; c = read_reg(rs2, 2);
            wr = true;
            if (funct7 == 0x01) {  // M extension
                switch (funct3) {
                    case 0: a = b * c; break;                                     // mul
                    case 1: a = (uint64_t)(((__int128)(int64_t)b * (int64_t)c) >> 64); break;  // mulh
                    case 2: a = (uint64_t)(((__int128)(int64_t)b * (unsigned __int128)c) >> 64); break; // mulhsu
                    case 3: a = (uint64_t)(((unsigned __int128)b * c) >> 64); break;  // mulhu
                    case 4: a = c == 0 ? ~0ULL : (c == ~0ULL && (int64_t)b == INT64_MIN) ? b : (uint64_t)((int64_t)b / (int64_t)c); break; // div
                    case 5: a = c == 0 ? ~0ULL : b / c; break;                    // divu
                    case 6: a = c == 0 ? b : (c == ~0ULL && (int64_t)b == INT64_MIN) ? 0 : (uint64_t)((int64_t)b % (int64_t)c); break; // rem
                    case 7: a = c == 0 ? b : b % c; break;                        // remu
                }
            } else {
                switch (funct3) {
                    case 0: a = funct7 == 0x20 ? b - c : b + c; break;
                    case 1: a = b << (c & 63); break;
                    case 2: a = (int64_t)b < (int64_t)c; break;
                    case 3: a = b < c; break;
                    case 4: a = b ^ c; break;
                    case 5: a = funct7 == 0x20 ? (uint64_t)((int64_t)b >> (c & 63)) : b >> (c & 63); break;
                    case 6: a = b | c; break;
                    case 7: a = b & c; break;
                }
            }
            break;
        }
        case 0x3b: {  // R-type W (32-bit)
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            ev.rs2_prev_ts = vm.reg_ts[rs2]; c = read_reg(rs2, 2);
            wr = true;
            uint32_t b32 = (uint32_t)b, c32 = (uint32_t)c;
            if (funct7 == 0x01) {
                switch (funct3) {
                    case 0: a = (uint64_t)sext((uint32_t)(b32 * c32), 32); break;  // mulw
                    case 4: a = c32 == 0 ? ~0ULL : (uint64_t)sext((uint32_t)((int32_t)b32 / (c32 == ~0u && (int32_t)b32 == INT32_MIN ? 1 : (int32_t)c32)), 32); break; // divw
                    case 5: a = c32 == 0 ? ~0ULL : (uint64_t)sext(b32 / c32, 32); break;  // divuw
                    case 6: a = c32 == 0 ? (uint64_t)sext(b32, 32) : (uint64_t)sext((uint32_t)((c32 == ~0u && (int32_t)b32 == INT32_MIN) ? 0 : (int32_t)b32 % (int32_t)c32), 32); break; // remw
                    case 7: a = c32 == 0 ? (uint64_t)sext(b32, 32) : (uint64_t)sext(b32 % c32, 32); break;  // remuw
                }
            } else {
                switch (funct3) {
                    case 0: a = (uint64_t)sext((uint32_t)(funct7 == 0x20 ? b32 - c32 : b32 + c32), 32); break;
                    case 1: a = (uint64_t)sext((uint32_t)(b32 << (c & 31)), 32); break;
                    case 5: a = funct7 == 0x20 ? (uint64_t)sext((uint32_t)((int32_t)b32 >> (c & 31)), 32)
                                              : (uint64_t)sext(b32 >> (c & 31), 32); break;
                }
            }
            break;
        }
        case 0x13: {  // I-type ALU
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            c = (uint64_t)imm_i;
            wr = true;
            switch (funct3) {
                case 0: a = b + c; break;
                case 1: a = b << (c & 63); break;
                case 2: a = (int64_t)b < (int64_t)c; break;
                case 3: a = b < c; break;
                case 4: a = b ^ c; break;
                case 5: a = ((instr >> 26) & 0x3f) == 0x10 ? (uint64_t)((int64_t)b >> (c & 63)) : b >> (c & 63); break;
                case 6: a = b | c; break;
                case 7: a = b & c; break;
            }
            break;
        }
        case 0x1b: {  // I-type W
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            c = (uint64_t)imm_i;
            wr = true;
            uint32_t b32 = (uint32_t)b;
            switch (funct3) {
                case 0: a = (uint64_t)sext((uint32_t)(b32 + (uint32_t)c), 32); break;
                case 1: a = (uint64_t)sext((uint32_t)(b32 << (c & 31)), 32); break;
                case 5: a = ((instr >> 26) & 0x3f) == 0x10 ? (uint64_t)sext((uint32_t)((int32_t)b32 >> (c & 31)), 32)
                                                          : (uint64_t)sext(b32 >> (c & 31), 32); break;
            }
            break;
        }
        case 0x03: {  // loads
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            uint64_t addr = b + (uint64_t)imm_i;
            if (addr >= (1ULL << 32)) return false;  // guest address space
            if (vm.user_mode && !prot_ok(vm, addr, PROT_READ, TRAP_READ_VIOLATION))
                return false;
            wr = true;
            switch (funct3) {
                case 0: a = load_sized(vm, addr, 0, true, ev); break;   // lb
                case 1: a = load_sized(vm, addr, 1, true, ev); break;   // lh
                case 2: a = load_sized(vm, addr, 2, true, ev); break;   // lw
                case 3: a = load_sized(vm, addr, 3, false, ev); break;  // ld
                case 4: a = load_sized(vm, addr, 0, false, ev); break;  // lbu
                case 5: a = load_sized(vm, addr, 1, false, ev); break;  // lhu
                case 6: a = load_sized(vm, addr, 2, false, ev); break;  // lwu
            }
            c = (uint64_t)imm_i;
            break;
        }
        case 0x23: {  // stores
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            ev.rs2_prev_ts = vm.reg_ts[rs2]; c = read_reg(rs2, 2);
            uint64_t addr = b + (uint64_t)imm_s;
            if (addr >= (1ULL << 32)) return false;  // guest address space
            if (vm.user_mode && !prot_ok(vm, addr, PROT_WRITE, TRAP_WRITE_VIOLATION))
                return false;
            switch (funct3) {
                case 0: store_sized(vm, addr, c, 0, ev); break;
                case 1: store_sized(vm, addr, c, 1, ev); break;
                case 2: store_sized(vm, addr, c, 2, ev); break;
                case 3: store_sized(vm, addr, c, 3, ev); break;
            }
            a = 0;
            break;
        }
        case 0x63: {  // branches
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            ev.rs2_prev_ts = vm.reg_ts[rs2]; c = read_reg(rs2, 2);
            bool take = false;
            switch (funct3) {
                case 0: take = b == c; break;
                case 1: take = b != c; break;
                case 4: take = (int64_t)b < (int64_t)c; break;
                case 5: take = (int64_t)b >= (int64_t)c; break;
                case 6: take = b < c; break;
                case 7: take = b >= c; break;
            }
            if (take) next_pc = vm.pc + (uint64_t)imm_b;
            break;
        }
        case 0x6f: {  // jal
            a = vm.pc + 4;
            wr = true;
            next_pc = vm.pc + (uint64_t)imm_j;
            break;
        }
        case 0x67: {  // jalr
            ev.rs1_prev_ts = vm.reg_ts[rs1]; b = read_reg(rs1, 1);
            a = vm.pc + 4;
            wr = true;
            next_pc = (b + (uint64_t)imm_i) & ~1ULL;
            break;
        }
        case 0x37: {  // lui
            a = (uint64_t)imm_u;
            wr = true;
            break;
        }
        case 0x17: {  // auipc
            a = vm.pc + (uint64_t)imm_u;
            wr = true;
            break;
        }
        case 0x73: {  // ecall
            // a7 (x17) = syscall id; our ABI: 0 = HALT(code in a0),
            // 2 = WRITE byte in a0, 3 = READ word -> a0.
            // For the AIR, ecall reads a7 as rs1 (slot 1) and a0 as rs2
            // (slot 2); READ writes a0 as rd (slot 4).
            ev.rs1_prev_ts = vm.reg_ts[17]; b = read_reg(17, 1);
            ev.rs2_prev_ts = vm.reg_ts[10]; c = read_reg(10, 2);
            uint64_t id = b;
            if (id < 64) vm.syscall_counts[id]++;
            if (id == 0) {
                vm.halted = true;
                vm.exit_code = c;
                ev.flags |= 4;
            } else if (id == 2) {
                vm.output.push_back((uint8_t)c);
            } else if (id == 3) {
                uint64_t v = vm.input_pos < vm.input_queue.size() ? vm.input_queue[vm.input_pos++] : 0;
                rd = 10;
                a = v;
                wr = true;
            } else if (id == 39) {
                // MPROTECT (reference: syscall_code.rs MPROTECT 0x132,
                // minimal/precompiles/mprotect.rs). Single-register ABI
                // (documented divergence, like the single-pointer
                // precompiles): a0 = page_addr | prot, with prot in the
                // low 12 bits (the page offset, necessarily zero for an
                // aligned address). Permitted prots match the
                // reference's PERMITTED_PROTS: NONE, R, RW, RX.
                uint64_t addr = c & ~((1ULL << LOG_PAGE_SIZE) - 1);
                uint8_t prot = (uint8_t)(c & ((1ULL << LOG_PAGE_SIZE) - 1));
                bool permitted = prot == PROT_NONE || prot == PROT_READ ||
                                 prot == (PROT_READ | PROT_WRITE) ||
                                 prot == (PROT_READ | PROT_EXEC);
                if (!permitted || c >= (1ULL << 32)) {
                    vm.trap_code = TRAP_BAD_MPROTECT;
                    vm.trap_addr = c;
                    return false;
                }
                page_table(vm)[addr >> LOG_PAGE_SIZE] = prot;
            } else if (id == 8) {
                // SHA_EXTEND precompile (reference role:
                // crates/core/executor/src/syscalls/precompiles/sha256/extend.rs).
                // ABI: a0 = cell-aligned pointer to w[0..64], one u32 per
                // 8-byte cell. Rounds j=0..47 compute w[16+j]; each round
                // runs at clk+1+j (the AIR's state chain skips the window).
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + 64 * 8 > (1ULL << 32)) return false;
                if (!px_prot_ok(vm, ptr, 64 * 8)) return false;
                for (int j = 0; j < 48; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = 8; px.step = (uint64_t)j; px.ptr = ptr;
                    int i = j + 16;
                    int offs[4] = {i - 15, i - 2, i - 16, i - 7};
                    uint32_t vals[4];
                    for (int k = 0; k < 4; k++) {
                        MemCell& mc = cell(vm, ptr + 8 * (uint64_t)offs[k]);
                        px.r_addr[k] = ptr + 8 * (uint64_t)offs[k];
                        px.r_prev_ts[k] = mc.ts;
                        px.r_val[k] = mc.value;
                        mc.ts = rclk * 8 + (uint64_t)k;  // read slots 0..3
                        vals[k] = (uint32_t)mc.value;
                    }
                    uint32_t w15 = vals[0], w2 = vals[1], w16 = vals[2], w7 = vals[3];
                    uint32_t s0 = rotr32(w15, 7) ^ rotr32(w15, 18) ^ (w15 >> 3);
                    uint32_t s1 = rotr32(w2, 17) ^ rotr32(w2, 19) ^ (w2 >> 10);
                    uint32_t wn = w16 + s0 + w7 + s1;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = wn;
                    wc.ts = rclk * 8 + 4;  // write slot 4
                    px.w_val = wn;
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += 48;  // next instruction runs after the window
            } else if (id == 9) {
                // SHA_COMPRESS precompile (reference role:
                // crates/core/executor/src/syscalls/precompiles/sha256/compress.rs).
                // ABI: a0 = cell-aligned pointer to a single buffer of
                // [w[0..64], h[0..8]], one u32 per 8-byte cell (h lives at
                // cells 64..72). 80 rounds at clk+1+step: steps 0..7 read
                // h[step], steps 8..71 read w[step-8] and run one
                // compression round, steps 72..79 write h[step-72] += var.
                static const uint32_t K[64] = {
                    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b,
                    0x59f111f1, 0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01,
                    0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7,
                    0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
                    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152,
                    0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
                    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
                    0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
                    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819,
                    0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116, 0x1e376c08,
                    0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f,
                    0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
                    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + 72 * 8 > (1ULL << 32)) return false;
                if (!px_prot_ok(vm, ptr, 72 * 8)) return false;
                uint32_t st[8];  // working variables a..h
                for (int j = 0; j < 80; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = 9; px.step = (uint64_t)j; px.ptr = ptr;
                    if (j < 8) {  // init: read h[j]
                        MemCell& mc = cell(vm, ptr + 8 * (uint64_t)(64 + j));
                        px.r_addr[0] = ptr + 8 * (uint64_t)(64 + j);
                        px.r_prev_ts[0] = mc.ts;
                        px.r_val[0] = mc.value;
                        mc.ts = rclk * 8;  // read slot 0
                        st[j] = (uint32_t)mc.value;
                    } else if (j < 72) {  // compression round
                        int i = j - 8;
                        MemCell& mc = cell(vm, ptr + 8 * (uint64_t)i);
                        px.r_addr[0] = ptr + 8 * (uint64_t)i;
                        px.r_prev_ts[0] = mc.ts;
                        px.r_val[0] = mc.value;
                        mc.ts = rclk * 8;
                        uint32_t w = (uint32_t)mc.value;
                        uint32_t e = st[4];
                        uint32_t S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
                        uint32_t ch = (e & st[5]) ^ (~e & st[6]);
                        uint32_t t1 = st[7] + S1 + ch + K[i] + w;
                        uint32_t a0v = st[0];
                        uint32_t S0 = rotr32(a0v, 2) ^ rotr32(a0v, 13) ^ rotr32(a0v, 22);
                        uint32_t maj = (a0v & st[1]) ^ (a0v & st[2]) ^ (st[1] & st[2]);
                        uint32_t t2 = S0 + maj;
                        st[7] = st[6]; st[6] = st[5]; st[5] = st[4];
                        st[4] = st[3] + t1;
                        st[3] = st[2]; st[2] = st[1]; st[1] = st[0];
                        st[0] = t1 + t2;
                    } else {  // finalize: h[j-72] += var (RMW)
                        int i = j - 72;
                        MemCell& wc = cell(vm, ptr + 8 * (uint64_t)(64 + i));
                        px.w_addr = ptr + 8 * (uint64_t)(64 + i);
                        px.w_prev_ts = wc.ts;
                        px.w_prev_val = wc.value;
                        uint32_t hn = (uint32_t)wc.value + st[i];
                        wc.value = hn;
                        wc.ts = rclk * 8 + 4;  // write slot 4
                        px.w_val = hn;
                    }
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += 80;
            } else if (id == 10) {
                // KECCAK_PERMUTE precompile (reference role:
                // crates/core/executor/src/syscalls/precompiles/keccak256/
                // permute.rs). ABI: a0 = cell-aligned pointer to the 25-lane
                // u64 state, one lane per 8-byte cell (row-major x + 5*y).
                // 74 steps at clk+1+step: steps 0..24 read lane j, steps
                // 25..48 run keccak-f round step-25 (no memory traffic),
                // steps 49..73 write lane step-49.
                static const uint64_t RC[24] = {
                    0x0000000000000001ULL, 0x0000000000008082ULL,
                    0x800000000000808aULL, 0x8000000080008000ULL,
                    0x000000000000808bULL, 0x0000000080000001ULL,
                    0x8000000080008081ULL, 0x8000000000008009ULL,
                    0x000000000000008aULL, 0x0000000000000088ULL,
                    0x0000000080008009ULL, 0x000000008000000aULL,
                    0x000000008000808bULL, 0x800000000000008bULL,
                    0x8000000000008089ULL, 0x8000000000008003ULL,
                    0x8000000000008002ULL, 0x8000000000000080ULL,
                    0x000000000000800aULL, 0x800000008000000aULL,
                    0x8000000080008081ULL, 0x8000000000008080ULL,
                    0x0000000080000001ULL, 0x8000000080008008ULL};
                static const int RHO[25] = {
                    0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25,
                    39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14};
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + 25 * 8 > (1ULL << 32)) return false;
                if (!px_prot_ok(vm, ptr, 25 * 8)) return false;
                uint64_t st64[25];
                for (int j = 0; j < 74; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = 10; px.step = (uint64_t)j; px.ptr = ptr;
                    if (j < 25) {  // load lane j
                        MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                        px.r_addr[0] = ptr + 8 * (uint64_t)j;
                        px.r_prev_ts[0] = mc.ts;
                        px.r_val[0] = mc.value;
                        mc.ts = rclk * 8;  // read slot 0
                        st64[j] = mc.value;
                    } else if (j < 49) {  // keccak-f round
                        int r = j - 25;
                        uint64_t cpar[5], d[5], b[25];
                        for (int x = 0; x < 5; x++)
                            cpar[x] = st64[x] ^ st64[x + 5] ^ st64[x + 10] ^
                                      st64[x + 15] ^ st64[x + 20];
                        for (int x = 0; x < 5; x++) {
                            uint64_t t = cpar[(x + 1) % 5];
                            d[x] = cpar[(x + 4) % 5] ^ ((t << 1) | (t >> 63));
                        }
                        for (int i2 = 0; i2 < 25; i2++) {
                            uint64_t v = st64[i2] ^ d[i2 % 5];
                            int rot = RHO[i2];
                            uint64_t rv = rot ? ((v << rot) | (v >> (64 - rot))) : v;
                            int x = i2 % 5, y = i2 / 5;
                            b[y + 5 * ((2 * x + 3 * y) % 5)] = rv;  // pi
                        }
                        for (int y = 0; y < 5; y++)
                            for (int x = 0; x < 5; x++)
                                st64[x + 5 * y] = b[x + 5 * y] ^
                                    (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
                        st64[0] ^= RC[r];
                    } else {  // store lane j-49
                        int i2 = j - 49;
                        MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i2);
                        px.w_addr = ptr + 8 * (uint64_t)i2;
                        px.w_prev_ts = wc.ts;
                        px.w_prev_val = wc.value;
                        wc.value = st64[i2];
                        wc.ts = rclk * 8 + 4;  // write slot 4
                        px.w_val = st64[i2];
                    }
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += 74;
            } else if (id == 38) {
                // poseidon2 precompile: permute 16 KoalaBear elements
                // (one per cell, low 32 bits; result must be canonical)
                int n_read = 16, n_write = 16;
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + (uint64_t)n_read * 8 > (1ULL << 32))
                    return false;
                if (!px_prot_ok(vm, ptr, (uint64_t)n_read * 8)) return false;
                uint64_t st[16];
                for (int j = 0; j < n_read; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = id; px.step = (uint64_t)j; px.ptr = ptr;
                    MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                    px.r_addr[0] = ptr + 8 * (uint64_t)j;
                    px.r_prev_ts[0] = mc.ts;
                    px.r_val[0] = mc.value;
                    mc.ts = rclk * 8;
                    if (mc.value >= KB_P) return false;  // non-canonical input
                    st[j] = mc.value;
                    if (vm.record) vm.px_events.push_back(px);
                }
                kb_poseidon2(st);
                for (int i = 0; i < n_write; i++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)(n_read + i);
                    PxEvent px{};
                    px.clk = rclk; px.kind = id;
                    px.step = (uint64_t)(n_read + i); px.ptr = ptr;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = st[i];
                    wc.ts = rclk * 8 + 4;
                    px.w_val = st[i];
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += (uint64_t)(n_read + n_write);
            } else if (id == 37) {
                // u256x2048_mul: a (4 dwords) * b (32 dwords) ->
                // lo (32 dwords) + hi (4 dwords), exact integer product
                // (reference: syscall/precompiles/u256x2048_mul/; our
                // single-pointer ABI packs [a | b] and overwrites the head)
                int n_read = 36, n_write = 36;
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + (uint64_t)n_read * 8 > (1ULL << 32))
                    return false;
                if (!px_prot_ok(vm, ptr, (uint64_t)n_read * 8)) return false;
                uint64_t in[36];
                for (int j = 0; j < n_read; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = id; px.step = (uint64_t)j; px.ptr = ptr;
                    MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                    px.r_addr[0] = ptr + 8 * (uint64_t)j;
                    px.r_prev_ts[0] = mc.ts;
                    px.r_val[0] = mc.value;
                    mc.ts = rclk * 8;
                    in[j] = mc.value;
                    if (vm.record) vm.px_events.push_back(px);
                }
                uint64_t out[36] = {0};
                for (int i = 0; i < 4; i++) {
                    unsigned __int128 carry = 0;
                    for (int j = 0; j < 32; j++) {
                        unsigned __int128 cur =
                            (unsigned __int128)in[i] * in[4 + j] +
                            out[i + j] + (uint64_t)carry;
                        out[i + j] = (uint64_t)cur;
                        carry = cur >> 64;
                    }
                    out[i + 32] += (uint64_t)carry;
                }
                for (int i = 0; i < n_write; i++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)(n_read + i);
                    PxEvent px{};
                    px.clk = rclk; px.kind = id;
                    px.step = (uint64_t)(n_read + i); px.ptr = ptr;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = out[i];
                    wc.ts = rclk * 8 + 4;
                    px.w_val = out[i];
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += (uint64_t)(n_read + n_write);
            } else if (id >= 25 && id <= 36) {
                // Fp / Fp2 tower precompiles for bn254 (25-30) and
                // bls12-381 (31-36): add/sub/mul on the base field and
                // the quadratic extension Fp2 = Fp[u]/(u^2 + 1)
                // (reference: syscall/precompiles/fptower/). ABI: x then
                // y in one cell buffer; the result overwrites x.
                typedef UBig<4> F254;
                typedef UBig<6> F381;
                static const F254 PB254 = {{0x3C208C16D87CFD47ULL,
                    0x97816A916871CA8DULL, 0xB85045B68181585DULL,
                    0x30644E72E131A029ULL}};
                static const F381 PB381 = {{0xB9FEFFFFFFFFAAABULL,
                    0x1EABFFFEB153FFFFULL, 0x6730D2A0F6B0F624ULL,
                    0x64774B84F38512BFULL, 0x4B1BA7B6434BACD7ULL,
                    0x1A0111EA397FE69AULL}};
                bool is381 = id >= 31;
                int nw = is381 ? 6 : 4;
                int op = (id - (is381 ? 31 : 25));  // 0..5
                bool fp2 = op >= 3;
                int kindop = op % 3;  // 0 add, 1 sub, 2 mul
                int n_read = (fp2 ? 4 : 2) * nw;
                int n_write = (fp2 ? 2 : 1) * nw;
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + (uint64_t)n_read * 8 > (1ULL << 32))
                    return false;
                if (!px_prot_ok(vm, ptr, (uint64_t)n_read * 8)) return false;
                uint64_t in[48];
                for (int j = 0; j < n_read; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = id; px.step = (uint64_t)j; px.ptr = ptr;
                    MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                    px.r_addr[0] = ptr + 8 * (uint64_t)j;
                    px.r_prev_ts[0] = mc.ts;
                    px.r_val[0] = mc.value;
                    mc.ts = rclk * 8;
                    in[j] = mc.value;
                    if (vm.record) vm.px_events.push_back(px);
                }
                uint64_t out[12] = {0};
                auto run = [&](auto P) {
                    typedef decltype(P) F;
                    auto get = [&](int base) {
                        F v;
                        for (int i = 0; i < nw; i++) v.w[i] = in[base + i];
                        return v;
                    };
                    auto put = [&](int base, const F& v) {
                        for (int i = 0; i < nw; i++) out[base + i] = v.w[i];
                    };
                    auto one_op = [&](const F& a, const F& b) {
                        if (kindop == 0) return ub_modadd(a, b, P);
                        if (kindop == 1) return ub_modsub(a, b, P);
                        return ub_modmul(a, b, P);
                    };
                    if (!fp2) {
                        put(0, one_op(get(0), get(nw)));
                    } else {
                        F x0 = get(0), x1 = get(nw);
                        F y0 = get(2 * nw), y1 = get(3 * nw);
                        if (kindop == 2) {  // (x0y0 - x1y1, x0y1 + x1y0)
                            put(0, ub_modsub(ub_modmul(x0, y0, P),
                                             ub_modmul(x1, y1, P), P));
                            put(nw, ub_modadd(ub_modmul(x0, y1, P),
                                              ub_modmul(x1, y0, P), P));
                        } else {
                            put(0, one_op(x0, y0));
                            put(nw, one_op(x1, y1));
                        }
                    }
                };
                if (is381) run(PB381); else run(PB254);
                for (int i = 0; i < n_write; i++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)(n_read + i);
                    PxEvent px{};
                    px.clk = rclk; px.kind = id;
                    px.step = (uint64_t)(n_read + i); px.ptr = ptr;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = out[i];
                    wc.ts = rclk * 8 + 4;
                    px.w_val = out[i];
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += (uint64_t)(n_read + n_write);
            } else if (id >= 22 && id <= 24) {
                // BLS12-381 G1 precompiles (384-bit field; reference:
                // syscalls/precompiles/weierstrass/ for bls12_381).
                // Same single-pointer cell ABI as the 256-bit family;
                // coordinates are 6 dwords little-endian.
                typedef UBig<6> U384;
                static const U384 PBLS = {{0xB9FEFFFFFFFFAAABULL,
                    0x1EABFFFEB153FFFFULL, 0x6730D2A0F6B0F624ULL,
                    0x64774B84F38512BFULL, 0x4B1BA7B6434BACD7ULL,
                    0x1A0111EA397FE69AULL}};
                int n_read, n_write;
                switch (id) {
                    case 22: n_read = 24; n_write = 12; break;  // add
                    case 23: n_read = 12; n_write = 12; break;  // double
                    default: n_read = 7;  n_write = 6;  break;  // decompress
                }
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + (uint64_t)n_read * 8 > (1ULL << 32))
                    return false;
                if (!px_prot_ok(vm, ptr, (uint64_t)n_read * 8)) return false;
                uint64_t in[24];
                for (int j = 0; j < n_read; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = id; px.step = (uint64_t)j; px.ptr = ptr;
                    MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                    px.r_addr[0] = ptr + 8 * (uint64_t)j;
                    px.r_prev_ts[0] = mc.ts;
                    px.r_val[0] = mc.value;
                    mc.ts = rclk * 8;
                    in[j] = mc.value;
                    if (vm.record) vm.px_events.push_back(px);
                }
                auto get6 = [&](int cell6) {
                    U384 v;
                    for (int i = 0; i < 6; i++) v.w[i] = in[cell6 + i];
                    return v;
                };
                uint64_t out[12] = {0};
                const U384& P = PBLS;
                if (id == 24) {
                    // decompress: y^2 = x^3 + 4; base root has lsb 0
                    uint64_t sign = in[0];
                    if (sign > 1) return false;
                    U384 x;
                    for (int i = 0; i < 6; i++) x.w[i] = in[1 + i];
                    U384 xx = ub_modmul(x, x, P);
                    U384 four; four.w[0] = 4;
                    U384 rhs = ub_modadd(ub_modmul(xx, x, P), four, P);
                    // (p+1)/4 sqrt exponent (p = 3 mod 4)
                    U384 e = P;
                    {   // e = (p + 1) >> 2
                        unsigned __int128 carry = 1;
                        for (int i = 0; i < 6 && carry; i++) {
                            unsigned __int128 sum = (unsigned __int128)e.w[i] + 1;
                            e.w[i] = (uint64_t)sum;
                            carry = sum >> 64;
                        }
                        for (int k = 0; k < 2; k++) {
                            for (int i = 0; i < 5; i++)
                                e.w[i] = (e.w[i] >> 1) | (e.w[i + 1] << 63);
                            e.w[5] >>= 1;
                        }
                    }
                    U384 y = ub_modpow(rhs, e, P);
                    if (ub_cmp(ub_modmul(y, y, P), rhs) != 0)
                        return false;  // x not on curve
                    if (y.w[0] & 1) y = ub_sub(P, y);
                    if (sign && !ub_is_zero(y)) y = ub_sub(P, y);
                    for (int i = 0; i < 6; i++) out[i] = y.w[i];
                } else if (id == 23) {
                    // double (a = 0)
                    U384 x = get6(0), y = get6(6);
                    if (ub_is_zero(y)) return false;
                    U384 xx = ub_modmul(x, x, P);
                    U384 three; three.w[0] = 3;
                    U384 num = ub_modmul(three, xx, P);
                    U384 two; two.w[0] = 2;
                    U384 den = ub_modmul(two, y, P);
                    U384 sl = ub_modmul(num, ub_modinv(den, P), P);
                    U384 ss = ub_modmul(sl, sl, P);
                    U384 x3 = ub_modsub(ub_modsub(ss, x, P), x, P);
                    U384 dx = ub_modsub(x, x3, P);
                    U384 y3 = ub_modsub(ub_modmul(sl, dx, P), y, P);
                    for (int i = 0; i < 6; i++) out[i] = x3.w[i];
                    for (int i = 0; i < 6; i++) out[i + 6] = y3.w[i];
                } else {
                    // add, distinct points
                    U384 x1 = get6(0), y1 = get6(6), x2 = get6(12), y2 = get6(18);
                    if (ub_cmp(x1, x2) == 0) return false;
                    U384 num = ub_modsub(y2, y1, P);
                    U384 den = ub_modsub(x2, x1, P);
                    U384 sl = ub_modmul(num, ub_modinv(den, P), P);
                    U384 ss = ub_modmul(sl, sl, P);
                    U384 x3 = ub_modsub(ub_modsub(ss, x1, P), x2, P);
                    U384 dx = ub_modsub(x1, x3, P);
                    U384 y3 = ub_modsub(ub_modmul(sl, dx, P), y1, P);
                    for (int i = 0; i < 6; i++) out[i] = x3.w[i];
                    for (int i = 0; i < 6; i++) out[i + 6] = y3.w[i];
                }
                for (int i = 0; i < n_write; i++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)(n_read + i);
                    PxEvent px{};
                    px.clk = rclk; px.kind = id;
                    px.step = (uint64_t)(n_read + i); px.ptr = ptr;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = out[i];
                    wc.ts = rclk * 8 + 4;
                    px.w_val = out[i];
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += (uint64_t)(n_read + n_write);
            } else if (id >= 11 && id <= 21) {
                // Curve / uint256 precompiles (reference roles:
                // syscalls/precompiles/{edwards/add.rs, weierstrass/add.rs,
                // weierstrass/double.rs, uint256/mod.rs}).
                // Single-pointer ABI (see sp1_tpu/riscv/curvechip.py):
                // a0 -> contiguous cell buffer; result overwrites the head.
                // One PxEvent per cell access: read j at clk+1+j (slot 0),
                // write i at clk+1+NR+i (slot 4).
                int n_read, n_write;
                switch (id) {
                    case 11: n_read = 16; n_write = 8; break;  // ed_add
                    case 12: n_read = 16; n_write = 8; break;  // secp256k1_add
                    case 13: n_read = 8;  n_write = 8; break;  // secp256k1_double
                    case 14: n_read = 12; n_write = 4; break;  // uint256_mul
                    case 16: n_read = 5;  n_write = 4; break;  // ed_decompress
                    case 17: n_read = 5;  n_write = 4; break;  // secp256k1_decompress
                    case 19: n_read = 8;  n_write = 8; break;  // secp256r1_double
                    case 20: n_read = 5;  n_write = 4; break;  // secp256r1_decompress
                    case 21: n_read = 8;  n_write = 8; break;  // bn254_double
                    default: n_read = 16; n_write = 8; break;  // *_add (15, 18)
                }
                uint64_t ptr = c;
                if ((ptr & 7) || ptr + (uint64_t)n_read * 8 > (1ULL << 32))
                    return false;
                if (!px_prot_ok(vm, ptr, (uint64_t)n_read * 8)) return false;
                uint64_t in[16];
                for (int j = 0; j < n_read; j++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)j;
                    PxEvent px{};
                    px.clk = rclk; px.kind = id; px.step = (uint64_t)j; px.ptr = ptr;
                    MemCell& mc = cell(vm, ptr + 8 * (uint64_t)j);
                    px.r_addr[0] = ptr + 8 * (uint64_t)j;
                    px.r_prev_ts[0] = mc.ts;
                    px.r_val[0] = mc.value;
                    mc.ts = rclk * 8;
                    in[j] = mc.value;
                    if (vm.record) vm.px_events.push_back(px);
                }
                auto getu = [&](int cell4) {
                    U256 v;
                    for (int i = 0; i < 4; i++) v.w[i] = in[cell4 + i];
                    return v;
                };
                uint64_t out[16] = {0};
                if (id == 14) {
                    // uint256_mul: x (cells 0..3) *= y (4..7) mod m (8..11);
                    // m == 0 means 2^256. Trap when the AIR's 256-bit carry
                    // would overflow (x*y >= m * 2^256).
                    U256 x = getu(0), y = getu(4), m = getu(8);
                    uint64_t prod[8];
                    u256_mul(x, y, prod);
                    U256 r;
                    if (u256_is_zero(m)) {
                        for (int i = 0; i < 4; i++) r.w[i] = prod[i];
                    } else {
                        r = u512_mod(prod, m);
                        // carry = (x*y - r) / m must fit 256 bits:
                        // equivalent to floor(x*y / m) < 2^256, i.e. the
                        // high half of x*y must be < m.
                        U256 hi;
                        for (int i = 0; i < 4; i++) hi.w[i] = prod[i + 4];
                        if (u256_cmp(hi, m) >= 0) return false;
                    }
                    for (int i = 0; i < 4; i++) out[i] = r.w[i];
                } else {
                    // curve ops: coordinates are 32-byte little-endian
                    static const U256 P25519 = {{0xFFFFFFFFFFFFFFEDULL,
                        0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL,
                        0x7FFFFFFFFFFFFFFFULL}};
                    static const U256 PSECP = {{0xFFFFFFFEFFFFFC2FULL,
                        0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL,
                        0xFFFFFFFFFFFFFFFFULL}};
                    static const U256 PBN254 = {{0x3C208C16D87CFD47ULL,
                        0x97816A916871CA8DULL, 0xB85045B68181585DULL,
                        0x30644E72E131A029ULL}};
                    // NIST P-256 (secp256r1) base field + a = -3, b
                    static const U256 PR1 = {{0xFFFFFFFFFFFFFFFFULL,
                        0x00000000FFFFFFFFULL, 0x0000000000000000ULL,
                        0xFFFFFFFF00000001ULL}};
                    static const U256 R1_B = {{0x3BCE3C3E27D2604BULL,
                        0x651D06B0CC53B0F6ULL, 0xB3EBBD55769886BCULL,
                        0x5AC635D8AA3A93E7ULL}};
                    static const U256 ED_D = {{0x75EB4DCA135978A3ULL,
                        0x00700A4D4141D8ABULL, 0x8CC740797779E898ULL,
                        0x52036CEE2B6FFE73ULL}};
                    const U256& P = (id == 11 || id == 16) ? P25519
                                  : (id == 15 || id == 21) ? PBN254
                                  : (id >= 18 && id <= 20) ? PR1 : PSECP;
                    U256 x3, y3;
                    if (id == 16) {
                        // ed25519 decompress: cells [sign, y(4)] -> x(4)
                        // x^2 = (y^2-1)/(d y^2+1); base root has lsb 0
                        uint64_t sign = in[0];
                        if (sign > 1) return false;
                        U256 y;
                        for (int i = 0; i < 4; i++) y.w[i] = in[1 + i];
                        U256 yy = u256_modmul(y, y, P);
                        U256 one; one.w[0] = 1;
                        U256 u = u256_modsub(yy, one, P);
                        U256 v = u256_modadd(u256_modmul(ED_D, yy, P), one, P);
                        U256 w = u256_modmul(u, u256_modinv(v, P), P);
                        // x = w^((p+3)/8); if x^2 != w, x *= 2^((p-1)/4)
                        U256 e = u256_shr(u256_add_small(P, 3), 3);
                        U256 x = u256_modpow(w, e, P);
                        if (u256_cmp(u256_modmul(x, x, P), w) != 0) {
                            U256 e2 = u256_shr(u256_sub(P, one), 2);
                            U256 two; two.w[0] = 2;
                            x = u256_modmul(x, u256_modpow(two, e2, P), P);
                        }
                        if (u256_cmp(u256_modmul(x, x, P), w) != 0)
                            return false;  // not on curve
                        if (x.w[0] & 1) x = u256_sub(P, x);
                        if (sign && !u256_is_zero(x)) x = u256_sub(P, x);
                        for (int i = 0; i < 4; i++) out[i] = x.w[i];
                        x3 = x; y3 = x;  // unused beyond out[]
                    } else if (id == 17) {
                        // secp256k1 decompress: cells [sign, x(4)] -> y(4)
                        uint64_t sign = in[0];
                        if (sign > 1) return false;
                        U256 x;
                        for (int i = 0; i < 4; i++) x.w[i] = in[1 + i];
                        U256 xx = u256_modmul(x, x, P);
                        U256 seven; seven.w[0] = 7;
                        U256 rhs = u256_modadd(u256_modmul(xx, x, P), seven, P);
                        U256 one; one.w[0] = 1;
                        U256 e = u256_shr(u256_add_small(P, 1), 2);  // (p+1)/4
                        U256 y = u256_modpow(rhs, e, P);
                        if (u256_cmp(u256_modmul(y, y, P), rhs) != 0)
                            return false;  // x not on curve
                        if (y.w[0] & 1) y = u256_sub(P, y);
                        if (sign && !u256_is_zero(y)) y = u256_sub(P, y);
                        for (int i = 0; i < 4; i++) out[i] = y.w[i];
                        x3 = y; y3 = y;
                    } else if (id == 11) {
                        // twisted-Edwards add (ed25519)
                        U256 x1 = getu(0), y1 = getu(4), x2 = getu(8), y2 = getu(12);
                        U256 x1y2 = u256_modmul(x1, y2, P);
                        U256 x2y1 = u256_modmul(x2, y1, P);
                        U256 y1y2 = u256_modmul(y1, y2, P);
                        U256 x1x2 = u256_modmul(x1, x2, P);
                        U256 f = u256_modmul(u256_modmul(x1, y1, P),
                                             u256_modmul(x2, y2, P), P);
                        U256 df = u256_modmul(ED_D, f, P);
                        U256 one; one.w[0] = 1;
                        U256 dp = u256_modadd(one, df, P);
                        U256 dm = u256_modsub(one, df, P);
                        x3 = u256_modmul(u256_modadd(x1y2, x2y1, P),
                                         u256_modinv(dp, P), P);
                        y3 = u256_modmul(u256_modadd(y1y2, x1x2, P),
                                         u256_modinv(dm, P), P);
                    } else if (id == 20) {
                        // secp256r1 decompress: y^2 = x^3 - 3x + b
                        uint64_t sign = in[0];
                        if (sign > 1) return false;
                        U256 x;
                        for (int i = 0; i < 4; i++) x.w[i] = in[1 + i];
                        U256 xx = u256_modmul(x, x, P);
                        U256 three; three.w[0] = 3;
                        U256 ax = u256_modsub(U256{}, u256_modmul(three, x, P), P);
                        U256 rhs = u256_modadd(
                            u256_modadd(u256_modmul(xx, x, P), ax, P), R1_B, P);
                        U256 one; one.w[0] = 1;
                        U256 e = u256_shr(u256_add_small(P, 1), 2);  // (p+1)/4
                        U256 y = u256_modpow(rhs, e, P);
                        if (u256_cmp(u256_modmul(y, y, P), rhs) != 0)
                            return false;  // x not on curve
                        if (y.w[0] & 1) y = u256_sub(P, y);
                        if (sign && !u256_is_zero(y)) y = u256_sub(P, y);
                        for (int i = 0; i < 4; i++) out[i] = y.w[i];
                        x3 = y; y3 = y;
                    } else if (id == 13 || id == 19 || id == 21) {
                        // Weierstrass double (a = 0 for k1/bn254, -3 for r1)
                        U256 x = getu(0), y = getu(4);
                        if (u256_is_zero(y)) return false;
                        U256 xx = u256_modmul(x, x, P);
                        U256 three; three.w[0] = 3;
                        U256 num = u256_modmul(three, xx, P);
                        if (id == 19)
                            num = u256_modsub(num, three, P);  // + a = -3
                        U256 two; two.w[0] = 2;
                        U256 den = u256_modmul(two, y, P);
                        U256 s = u256_modmul(num, u256_modinv(den, P), P);
                        U256 ss = u256_modmul(s, s, P);
                        x3 = u256_modsub(u256_modsub(ss, x, P), x, P);
                        U256 dx = u256_modsub(x, x3, P);
                        y3 = u256_modsub(u256_modmul(s, dx, P), y, P);
                    } else {
                        // Weierstrass add, distinct points (secp256k1/bn254)
                        U256 x1 = getu(0), y1 = getu(4), x2 = getu(8), y2 = getu(12);
                        if (u256_cmp(x1, x2) == 0) return false;
                        U256 num = u256_modsub(y2, y1, P);
                        U256 den = u256_modsub(x2, x1, P);
                        U256 s = u256_modmul(num, u256_modinv(den, P), P);
                        U256 ss = u256_modmul(s, s, P);
                        x3 = u256_modsub(u256_modsub(ss, x1, P), x2, P);
                        U256 dx = u256_modsub(x1, x3, P);
                        y3 = u256_modsub(u256_modmul(s, dx, P), y1, P);
                    }
                    for (int i = 0; i < 4; i++) out[i] = x3.w[i];
                    for (int i = 0; i < 4; i++) out[i + 4] = y3.w[i];
                }
                for (int i = 0; i < n_write; i++) {
                    uint64_t rclk = vm.clk + 1 + (uint64_t)(n_read + i);
                    PxEvent px{};
                    px.clk = rclk; px.kind = id;
                    px.step = (uint64_t)(n_read + i); px.ptr = ptr;
                    MemCell& wc = cell(vm, ptr + 8 * (uint64_t)i);
                    px.w_addr = ptr + 8 * (uint64_t)i;
                    px.w_prev_ts = wc.ts;
                    px.w_prev_val = wc.value;
                    wc.value = out[i];
                    wc.ts = rclk * 8 + 4;
                    px.w_val = out[i];
                    if (vm.record) vm.px_events.push_back(px);
                }
                vm.clk += (uint64_t)(n_read + n_write);
            }
            break;
        }
        default:
            return false;  // illegal instruction
    }

    if (wr && rd != 0) {
        ev.rd_prev_ts = vm.reg_ts[rd];
        ev.rd_prev_val = vm.regs[rd];
        vm.regs[rd] = a;
        vm.reg_ts[rd] = vm.clk * 8 + 4;
    }
    // Record the true computed result even when rd == x0: the register
    // file write is skipped (and the AIR's write send is gated by
    // rd_write_mult), but the result-binding constraints hold ungated,
    // which keeps legal rd=x0 encodings (hints like `ori x0, ...`)
    // provable (reference role: the reference's op_a_0 handling in
    // crates/core/machine/src/cpu/).
    ev.a = wr ? a : 0;
    ev.b = b;
    ev.c = c;
    ev.next_pc = next_pc;
    if (vm.record) vm.events.push_back(ev);
    vm.pc = next_pc;
    return !vm.halted;
}

}  // namespace

extern "C" {

void* ex_create(const uint32_t* words, uint64_t n, uint64_t pc_base) {
    VM* vm = new VM();
    vm->program.assign(words, words + n);
    vm->pc_base = pc_base;
    vm->pc = pc_base;
    return vm;
}

void ex_set_record(void* h, uint64_t on) {
    ((VM*)h)->record = on != 0;
}

void ex_set_input(void* h, const uint64_t* words, uint64_t n) {
    VM* vm = (VM*)h;
    vm->input_queue.assign(words, words + n);
}

void ex_set_pc(void* h, uint64_t pc) {
    VM* vm = (VM*)h;
    vm->pc = pc;
}

void ex_write_memory(void* h, uint64_t addr, uint64_t value) {
    VM* vm = (VM*)h;
    cell(*vm, addr).value = value;
}

// Returns: 0 halted, 1 max_cycles reached, -1 illegal instruction / oob
// pc, -2 page-protection fault (untrusted mode; see ex_trap).
int64_t ex_run(void* h, uint64_t max_cycles) {
    VM* vm = (VM*)h;
    while (!vm->halted && vm->clk < max_cycles) {
        if (!step(*vm)) return vm->halted ? 0 : (vm->trap_code ? -2 : -1);
    }
    return vm->halted ? 0 : 1;
}

// Untrusted (user-mode) execution controls.
void ex_set_mode(void* h, uint64_t user) { ((VM*)h)->user_mode = user != 0; }

void ex_set_page_prot(void* h, uint64_t addr, uint64_t prot) {
    VM* vm = (VM*)h;
    page_table(*vm)[(addr >> LOG_PAGE_SIZE) & (NUM_PAGES - 1)] = (uint8_t)prot;
}

uint64_t ex_trap(void* h) { return ((VM*)h)->trap_code; }
uint64_t ex_trap_addr(void* h) { return ((VM*)h)->trap_addr; }

// Chunked execution: run until `max_events` NEW events are buffered (or
// halt/illegal). With ex_clear_events between calls this bounds resident
// memory for multi-billion-cycle programs — each drained chunk is exactly
// one shard's worth of events (reference role: the JIT's shm trace ring +
// splicing, crates/core/jit/src/shm.rs, core/executor/src/splicing.rs).
// Returns: 0 halted, 1 chunk full, -1 illegal instruction / oob pc.
int64_t ex_run_chunk(void* h, uint64_t max_events) {
    VM* vm = (VM*)h;
    vm->events.reserve(max_events);
    while (!vm->halted && vm->events.size() < max_events) {
        if (!step(*vm)) return vm->halted ? 0 : (vm->trap_code ? -2 : -1);
    }
    return vm->halted ? 0 : 1;
}

void ex_clear_events(void* h) {
    VM* vm = (VM*)h;
    vm->events.clear();
    vm->px_events.clear();
}

// Execution report: opcode-class histogram + syscall counts.
uint64_t ex_report_len() { return OP_CLASS_COUNT + 64; }
void ex_report(void* h, uint64_t* out) {
    VM* vm = (VM*)h;
    memcpy(out, vm->op_counts, OP_CLASS_COUNT * sizeof(uint64_t));
    memcpy(out + OP_CLASS_COUNT, vm->syscall_counts, 64 * sizeof(uint64_t));
}

uint64_t ex_num_events(void* h) { return ((VM*)h)->events.size(); }

void ex_get_events(void* h, uint64_t* out) {
    VM* vm = (VM*)h;
    static_assert(sizeof(Event) == 16 * 8, "event layout");
    memcpy(out, vm->events.data(), vm->events.size() * sizeof(Event));
}

uint64_t ex_num_px_events(void* h) { return ((VM*)h)->px_events.size(); }

void ex_get_px_events(void* h, uint64_t* out) {
    VM* vm = (VM*)h;
    static_assert(sizeof(PxEvent) == 20 * 8, "px event layout");
    memcpy(out, vm->px_events.data(), vm->px_events.size() * sizeof(PxEvent));
}

uint64_t ex_exit_code(void* h) { return ((VM*)h)->exit_code; }
uint64_t ex_clk(void* h) { return ((VM*)h)->clk; }
uint64_t ex_reg(void* h, uint64_t r) { return ((VM*)h)->regs[r & 31]; }
uint64_t ex_reg_ts(void* h, uint64_t r) { return ((VM*)h)->reg_ts[r & 31]; }

uint64_t ex_output_len(void* h) { return ((VM*)h)->output.size(); }
void ex_get_output(void* h, uint8_t* out) {
    VM* vm = (VM*)h;
    memcpy(out, vm->output.data(), vm->output.size());
}

// Touched memory (for global init/final shards): returns count; fills
// (addr, value, ts) triples when buffers are non-null.
uint64_t ex_touched_memory(void* h, uint64_t* addrs, uint64_t* vals, uint64_t* tss) {
    VM* vm = (VM*)h;
    if (addrs) {
        uint64_t i = 0;
        for (auto& kv : vm->memory) {
            addrs[i] = kv.first;
            vals[i] = kv.second.value;
            tss[i] = kv.second.ts;
            i++;
        }
    }
    return vm->memory.size();
}

void ex_destroy(void* h) { delete (VM*)h; }

}  // extern "C"
